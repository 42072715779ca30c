"""Online-loop benchmark: the full self-supervision cycle on TPU.

Measures the three production rates of the online system against the
reference's design points (default.yaml:39-41: 10 Hz images, 10 Hz
supervision, 10 grad steps/s) and the BASELINE north star
("online train-step p50 < camera frame time"):

  * fused per-frame inference (resize + DINO ViT-S + SLIC/grid +
    pooling + MLP + confidence) — single dispatch;
  * supervision reprojection+fusion update (fan-out 32 @ input_size^2);
  * train step (batch 8 x S segments, fwd/loss/bwd/adam/confidence).

Dedup-proof method: distinct inputs per iteration, fence all outputs.

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
                    key=jax.random.PRNGKey(0), buffer_capacity=128, reprojection_fanout=32)
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

    # warm up everything (fills the graph too)
    imgs = [jnp.asarray(rng.rand(3, args.size, args.size).astype(np.float32)) for _ in range(args.iters + 10)]
    jax.block_until_ready(imgs)

    t_img, t_sup, t_train = [], [], []
    x = 0.0
    for i, img in enumerate(imgs):
        x += 0.11
        t0 = time.time()
        res = rt.image_callback(img, i * 0.1, "front", K, args.size, args.size, pose(x), cam_in_base)
        jax.block_until_ready(rt.estimator.buffer.features)
        if i >= 5:
            t_img.append(time.time() - t0)

        t0 = time.time()
        rt.robot_state_callback(i * 0.1 + 0.01, pose(x), np.array([1.0, 0, 0, 0, 0, 0]) + rng.randn(6) * 0.02,
                                np.array([1.0, 0, 0, 0, 0, 0]))
        jax.block_until_ready(rt.estimator.buffer.supervision_mask)
        if i >= 5:
            t_sup.append(time.time() - t0)

        t0 = time.time()
        st = rt.learning_step()
        jax.block_until_ready(rt.estimator.params)
        if i >= 5 and st.loss_total > 0:
            t_train.append(time.time() - t0)

    def p(ts):
        a = np.asarray(ts) * 1e3
        return {"p50_ms": round(float(np.percentile(a, 50)), 2), "p95_ms": round(float(np.percentile(a, 95)), 2)}

    frame_time_ms = 100.0  # 10 Hz camera
    result = {
        "image_callback": p(t_img),
        "supervision_update": p(t_sup),
        "train_step": p(t_train),
        "train_p50_under_frame_time": p(t_train)["p50_ms"] < frame_time_ms,
        "sustainable_rates_hz": {
            "images": round(1000 / p(t_img)["p50_ms"], 1),
            "supervision": round(1000 / p(t_sup)["p50_ms"], 1),
            "train": round(1000 / p(t_train)["p50_ms"], 1),
        },
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()

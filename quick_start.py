"""Offline inference CLI — the quick_start of the TPU framework.

Mirror of the reference /root/reference/quick_start.py:50-221 (the
BASELINE config-1 surface): run the frozen backbone + traversability
head + confidence over a folder of images and write side-by-side
(input | traversability | confidence) PNGs.

Differences from the reference, by design:
  * one jitted program per image shape (first call compiles);
  * checkpoints are this framework's (flax msgpack via
    TraversabilityEstimator.save_checkpoint) — pass --ckpt; without
    one, the head is random-initialized (useful for smoke tests and
    timing; the pretrained torch checkpoints of the reference can be
    converted with tools/convert_dino_weights.py + a trained head).

Example:
    python quick_start.py --image_folder assets/demo_data \
        --output_folder results/demo --feature_type dino \
        --segmentation_type slic --network_input_image_height 224
"""

from __future__ import annotations

import argparse
import os
import pickle
import time
from pathlib import Path

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="TPU-native WVN offline inference")
    p.add_argument("--model_name", type=str, default="indoor_mpi",
                   help="label for the run (reference quick_start.py:57)")
    p.add_argument("--ckpt", type=str, default=None,
                   help="checkpoint from TraversabilityEstimator.save_checkpoint; "
                        "defaults to the shipped replay-trained head "
                        "(assets/checkpoints/replay_demo_head.ckpt) when present; "
                        "pass --ckpt '' to force a random-init head")
    p.add_argument("--image_folder", type=str, default="/root/reference/assets/demo_data")
    p.add_argument("--output_folder", type=str, default="results/demo_data")
    p.add_argument("--network_input_image_height", type=int, default=224)
    p.add_argument("--network_input_image_width", type=int, default=224)
    p.add_argument("--segmentation_type", type=str, default="slic",
                   choices=["slic", "grid", "random", "stego", "none"])
    p.add_argument("--feature_type", type=str, default="dino", choices=["dino", "dinov2", "stego", "sift"])
    p.add_argument("--dino_patch_size", type=int, default=8, choices=[8, 14, 16])
    p.add_argument("--dino_backbone", type=str, default="vit_small")
    p.add_argument("--slic_num_components", type=int, default=100)
    p.add_argument("--compute_confidence", action="store_true", default=True)
    p.add_argument("--no-compute_confidence", dest="compute_confidence", action="store_false")
    p.add_argument("--prediction_per_pixel", action="store_true", default=True)
    p.add_argument("--no-prediction_per_pixel", dest="prediction_per_pixel", action="store_false")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from wild_visual_navigation_tpu.feature_extractor import FeatureExtractor
    from wild_visual_navigation_tpu.models import get_model
    from wild_visual_navigation_tpu.ops.resize import resize_image
    from wild_visual_navigation_tpu.utils import (
        ConfidenceConfig,
        confidence_init,
        reconstruction_confidence,
    )
    from wild_visual_navigation_tpu.visu import LearningVisualizer

    H = args.network_input_image_height
    W = args.network_input_image_width

    print(f"device: {jax.devices()[0]}")
    fe = FeatureExtractor(
        key=jax.random.PRNGKey(0),
        segmentation_type=args.segmentation_type,
        feature_type=args.feature_type,
        input_size=H,
        patch_size=args.dino_patch_size,
        backbone_type=args.dino_backbone,
        slic_num_components=args.slic_num_components,
    )
    D = fe.feature_dim

    model = get_model({
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [256, 32, 1], "reconstruction": True},
    })
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, D)))
    cg_state = confidence_init()
    cg_cfg = ConfidenceConfig(std_factor=0.5, method="latest_measurement")
    if args.ckpt is None:
        # shipped framework-trained head (tools/train_demo_head.py) —
        # the reference's released-checkpoint flow (quick_start.py:141-150)
        default_ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "assets/checkpoints/replay_demo_head.ckpt")
        if (args.feature_type, args.dino_backbone, args.dino_patch_size) == ("dino", "vit_small", 8) \
                and os.path.exists(default_ckpt):
            args.ckpt = default_ckpt
    if args.ckpt:
        from flax import serialization

        with open(args.ckpt, "rb") as f:
            payload = pickle.load(f)
        arch = payload.get("arch")
        if arch is not None:
            # converted reference checkpoints (tools/convert_reference_checkpoint.py)
            # carry their architecture; rebuild the head to match it
            if arch["input_size"] != D:
                raise SystemExit(
                    f"checkpoint expects {arch['input_size']}-dim features but "
                    f"{args.feature_type}/{args.dino_backbone} produces {D}"
                )
            model = get_model({
                "name": "SimpleMLP",
                "simple_mlp_cfg": {"input_size": D, "hidden_sizes": arch["hidden_sizes"],
                                   "reconstruction": arch["reconstruction"]},
            })
            params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, D)))
        params = serialization.from_bytes(params, payload["params"])
        cg_state = serialization.from_bytes(cg_state, payload["cg_state"])
        print(f"loaded checkpoint {args.ckpt} (step {payload.get('step')})")

    # heads without reconstruction outputs (converter --no-reconstruction)
    # have no residual to calibrate — confidence is all-ones then, like
    # the anomaly path's
    has_reco = getattr(model, "reconstruction", True)

    def _confidence(cg_state, x, out):
        if has_reco:
            return reconstruction_confidence(cg_cfg, cg_state, x, out[:, 1:])
        return jnp.ones(out.shape[0], out.dtype)

    @jax.jit
    def predict_dense(params, cg_state, dense_feat):
        Df, Hf, Wf = dense_feat.shape
        x = dense_feat.reshape(Df, -1).T
        out = model.apply(params, x)
        trav = out[:, 0].reshape(Hf, Wf)
        conf = _confidence(cg_state, x, out).reshape(Hf, Wf)
        return trav, conf

    @jax.jit
    def predict_segments(params, cg_state, feat, seg):
        out = model.apply(params, feat)
        conf_seg = _confidence(cg_state, feat, out)
        sid = seg.clip(0, feat.shape[0] - 1)
        return out[:, 0][sid], conf_seg[sid]

    visu = LearningVisualizer(p_visu=args.output_folder, store=True)
    os.makedirs(args.output_folder, exist_ok=True)

    images = sorted(
        p for p in Path(args.image_folder).iterdir() if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    if not images:
        raise SystemExit(f"no images found in {args.image_folder}")

    for i, path in enumerate(images):
        img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
        img = jnp.asarray(img).transpose(2, 0, 1)[None]
        img_r = resize_image(img, H, None if H == W else W)

        t0 = time.time()
        ex = fe.extract(img_r, return_dense_features=args.prediction_per_pixel)
        if args.prediction_per_pixel and ex.dense_features is not None:
            trav, conf = predict_dense(params, cg_state, ex.dense_features)
        else:
            trav, conf = predict_segments(params, cg_state, ex.features, ex.segments)
        trav.block_until_ready()
        dt = time.time() - t0

        base = np.asarray(img_r[0]).transpose(1, 2, 0)
        panels = [base, visu.plot_detectron_classification(base, np.asarray(trav), alpha=0.6)]
        if args.compute_confidence and conf is not None:
            panels.append(visu.plot_detectron_classification(base, np.asarray(conf), alpha=0.6))
        out = np.concatenate(panels, axis=1)
        out_path = os.path.join(args.output_folder, f"{path.stem}_{args.model_name}_trav.png")
        Image.fromarray((np.clip(out, 0, 1) * 255).astype(np.uint8)).save(out_path)
        print(f"[{i+1}/{len(images)}] {path.name}: {dt*1e3:.1f} ms -> {out_path}")


if __name__ == "__main__":
    main()

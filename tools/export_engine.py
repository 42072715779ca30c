"""Export an AOT-compiled inference engine — the reference's
TensorRT-engine workflow (dino_trt_interface.py:18-181: build a .trt
offline, deserialize + execute at deploy time), TPU-native:

  1. build the fused per-frame program for a camera configuration;
  2. AOT-compile it at the FIXED deployment shape (warming XLA's
     persistent compilation cache — the serialized-engine analogue);
  3. persist the engine spec (params + input contract + metadata) as
     one file feature_extractor.aot_engine.load_engine_spec consumes.

Usage:
    python tools/export_engine.py --size 224 --batch 1 \
        --out assets/engines/dinov2_vits14_224.engine

At deploy time, rebuilding the engine with the same spec + warm cache
skips recompilation entirely.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", type=str, default="dinov2")
    ap.add_argument("--backbone_type", type=str, default="vit_small")
    ap.add_argument("--patch_size", type=int, default=14)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--cache", type=str, default="/tmp/wvn_xla_cache")
    ap.add_argument("--out", type=str, default="assets/engines/engine.spec")
    ap.add_argument("--head_ckpt", type=str, default=None,
                    help="optional trained head checkpoint (TraversabilityEstimator format)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.feature_extractor.aot_engine import (
        AOTEngine,
        enable_persistent_cache,
        save_engine_spec,
    )
    from wild_visual_navigation_tpu.models import get_model
    from wild_visual_navigation_tpu.models.vit import dense_features, make_vit

    enable_persistent_cache(args.cache)

    size = (args.size // args.patch_size) * args.patch_size
    vit = make_vit(args.backbone, args.backbone_type, args.patch_size)
    key = jax.random.PRNGKey(0)
    vit_params = vit.init(key, jnp.zeros((1, 3, size, size)))
    D = vit.cfg.embed_dim
    mlp = get_model({
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [256, 32, 1], "reconstruction": True},
    })
    mlp_params = mlp.init(jax.random.fold_in(key, 1), jnp.zeros((1, D)))
    if args.head_ckpt:
        import pickle

        from flax import serialization

        with open(args.head_ckpt, "rb") as f:
            payload = pickle.load(f)
        mlp_params = serialization.from_bytes(mlp_params, payload["params"])
        print(f"loaded head from {args.head_ckpt} (step {payload.get('step')})")

    def pipeline(params, imgs):
        vp, mp = params
        feat = dense_features(vit, vp, imgs)
        B, Dd, Hp, Wp = feat.shape
        flat = feat.transpose(0, 2, 3, 1).reshape(-1, Dd)
        out = mlp.apply(mp, flat)
        return out[:, 0].reshape(B, Hp, Wp)

    example = jnp.zeros((args.batch, 3, size, size), jnp.float32)
    engine = AOTEngine(pipeline, (vit_params, mlp_params), example)
    print(f"compiled in {engine.compile_seconds:.1f}s; flops/call={engine.flops}")

    t0 = time.time()
    out = engine(example)
    out.block_until_ready()
    print(f"first call: {(time.time() - t0) * 1e3:.1f} ms; output {out.shape}")

    path = save_engine_spec(
        args.out, (vit_params, mlp_params), engine.input_shape, str(engine.input_dtype),
        meta={
            "backbone": args.backbone, "backbone_type": args.backbone_type,
            "patch_size": args.patch_size, "size": size, "cache": args.cache,
        },
    )
    print(f"engine spec: {path}")


if __name__ == "__main__":
    main()

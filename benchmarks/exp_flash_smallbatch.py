"""Does the padding-tight flash kernel win BELOW the auto pocket's
B*heads >= 48 floor? Full ViT-S/14 @448 (S=1025, H6) at B=1/4/8:
interleaved rounds, value-fenced, medians (bench.py protocol).

The auto heuristic (models/vit.py::_resolve_attention_impl) currently
requires B*heads >= 48, so B<=8 ViT-S falls back to xla_bf16 — this
experiment measures whether that floor is right.

Run: timeout 900 python benchmarks/exp_flash_smallbatch.py
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

SIZE = 448
ITERS = 30
ROUNDS = 5
BATCHES = (1, 4, 8)


def main():
    import jax
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.models.vit import VIT_CONFIGS, VisionTransformer
    from wild_visual_navigation_tpu.ops.resize import imagenet_normalize

    cfg = VIT_CONFIGS["dinov2_vit_small_14"]
    key = jax.random.PRNGKey(0)
    vit_b = VisionTransformer(cfg, attention_impl="xla_bf16", dtype=jnp.bfloat16,
                              ln_dtype=jnp.bfloat16)
    vit_f = VisionTransformer(cfg, attention_impl="flash", dtype=jnp.bfloat16,
                              ln_dtype=jnp.bfloat16)
    params = vit_b.init(key, jnp.zeros((1, 3, SIZE, SIZE)))

    variants = {
        "xla_bf16": jax.jit(lambda p, x: vit_b.apply(p, imagenet_normalize(x))["patch_tokens"][:, 0]),
        "flash": jax.jit(lambda p, x: vit_f.apply(p, imagenet_normalize(x))["patch_tokens"][:, 0]),
    }

    for B in BATCHES:
        x = jax.random.uniform(jax.random.fold_in(key, B), (B, 3, SIZE, SIZE))
        x.block_until_ready()
        outs = {}
        for name, fn in variants.items():
            outs[name] = np.asarray(fn(params, x))
            float(outs[name].ravel()[0])
        err = np.abs(outs["flash"] - outs["xla_bf16"]).max()
        results = {name: [] for name in variants}
        for r in range(ROUNDS):
            for name, fn in variants.items():
                t0 = time.time()
                carry = jnp.zeros(())
                for i in range(ITERS):
                    out = fn(params, x + carry * 1e-12 + i * 1e-9)
                    carry = out.ravel()[0]
                float(carry)
                dt = time.time() - t0
                results[name].append(dt / ITERS * 1e3)
        print(f"\n=== B={B} (S=1025, H6; max|diff|={err:.4f}) ===")
        for name, vals in results.items():
            med = statistics.median(vals[1:])  # drop warm-up round
            print(f"  {name}: {med:.2f} ms ({B/med*1e3:.0f} img/s)  "
                  f"{sorted(round(v, 2) for v in vals)}")


if __name__ == "__main__":
    main()

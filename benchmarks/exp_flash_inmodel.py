"""Full-ViT flash-vs-XLA attention comparison (tuned flash blocks).

5 interleaved rounds, value-fenced, medians. B16 @448 ViT-S/14.

Run: timeout 900 python benchmarks/exp_flash_inmodel.py
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

B, SIZE = 16, 448
ITERS = 20
ROUNDS = 5


def main():
    import jax
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.models.vit import VIT_CONFIGS, VisionTransformer
    from wild_visual_navigation_tpu.ops.resize import imagenet_normalize

    cfg = VIT_CONFIGS["dinov2_vit_small_14"]
    key = jax.random.PRNGKey(0)
    vit_x = VisionTransformer(cfg, attention_impl="xla", dtype=jnp.bfloat16)
    vit_f = VisionTransformer(cfg, attention_impl="flash", dtype=jnp.bfloat16)
    params = vit_x.init(key, jnp.zeros((1, 3, SIZE, SIZE)))

    vit_b = VisionTransformer(cfg, attention_impl="xla_bf16", dtype=jnp.bfloat16, ln_dtype=jnp.bfloat16)
    vit_f2 = VisionTransformer(cfg, attention_impl="flash:384:1152", dtype=jnp.bfloat16, ln_dtype=jnp.bfloat16)
    vit_f3 = VisionTransformer(cfg, attention_impl="flash:576:1152", dtype=jnp.bfloat16, ln_dtype=jnp.bfloat16)
    vit_f4 = VisionTransformer(cfg, attention_impl="flash:1152:1152", dtype=jnp.bfloat16, ln_dtype=jnp.bfloat16)
    variants = {
        "xla_bf16_ln16": jax.jit(lambda p, x: vit_b.apply(p, imagenet_normalize(x))["patch_tokens"][:, 0]),
        "flash_384_1152": jax.jit(lambda p, x: vit_f2.apply(p, imagenet_normalize(x))["patch_tokens"][:, 0]),
        "flash_576_1152": jax.jit(lambda p, x: vit_f3.apply(p, imagenet_normalize(x))["patch_tokens"][:, 0]),
        "flash_1152_1152": jax.jit(lambda p, x: vit_f4.apply(p, imagenet_normalize(x))["patch_tokens"][:, 0]),
    }

    x = jax.random.uniform(jax.random.fold_in(key, 9), (B, 3, SIZE, SIZE))
    x.block_until_ready()

    outs = {}
    for name, fn in variants.items():
        out = fn(params, x)
        outs[name] = np.asarray(out)
        float(outs[name].ravel()[0])
        print(f"compiled {name}", flush=True)
    ref = outs["xla_bf16_ln16"]
    for n, o in outs.items():
        print(f"max|{n} - ref| = {np.abs(o - ref).max():.5f}", flush=True)

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
            print(f"round {r} {name}: {dt/ITERS*1e3:.2f} ms/call ({B/(dt/ITERS)*1e3:.0f} img/s)", flush=True)

    print("\n=== medians ===")
    for name, vals in results.items():
        med = statistics.median(vals)
        print(f"{name}: {med:.2f} ms ({B/med*1e3:.0f} img/s)  {sorted(round(v,2) for v in vals)}")


if __name__ == "__main__":
    main()

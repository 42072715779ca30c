"""Full-ViT breakdown: where do the milliseconds go at B16 @448?

Variants (value-fenced interleaved medians):
  * vit12_xla / vit12_flash — full ViT, XLA vs Pallas flash (512/1024)
  * vit{1,6}_xla            — depth ablation -> per-block cost
  * patch_embed             — patch conv + pos embed only (depth 0)
  * normalize               — imagenet_normalize alone

Run: timeout 900 python benchmarks/exp_vit_breakdown.py
"""

from __future__ import annotations

import dataclasses
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

B, SIZE = 16, 448
ITERS = 20
ROUNDS = 3


def main():
    import jax
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.models.vit import VIT_CONFIGS, VisionTransformer
    from wild_visual_navigation_tpu.ops.resize import imagenet_normalize

    cfg12 = VIT_CONFIGS["dinov2_vit_small_14"]
    key = jax.random.PRNGKey(0)

    vits = {}
    for depth in (1, 6, 12):
        cfg = dataclasses.replace(cfg12, depth=depth)
        vit = VisionTransformer(cfg, attention_impl="xla", dtype=jnp.bfloat16)
        params = vit.init(key, jnp.zeros((1, 3, SIZE, SIZE)))
        vits[f"vit{depth}_xla"] = (vit, params)
    vit_fl = VisionTransformer(cfg12, attention_impl="flash", dtype=jnp.bfloat16)
    vits["vit12_flash"] = (vit_fl, vits["vit12_xla"][1])

    variants = {}
    for name, (vit, params) in vits.items():
        variants[name] = (jax.jit(lambda p, x, _vit=vit: _vit.apply(p, imagenet_normalize(x))["patch_tokens"][:, 0]), params)

    cfg0 = dataclasses.replace(cfg12, depth=0)
    vit0 = VisionTransformer(cfg0, attention_impl="xla", dtype=jnp.bfloat16)
    p0 = vit0.init(key, jnp.zeros((1, 3, SIZE, SIZE)))
    variants["patch_embed"] = (jax.jit(lambda p, x: vit0.apply(p, imagenet_normalize(x))["patch_tokens"][:, 0]), p0)
    variants["normalize"] = (jax.jit(lambda p, x: imagenet_normalize(x)[:, 0, 0]), None)

    x = jax.random.uniform(jax.random.fold_in(key, 9), (B, 3, SIZE, SIZE))
    x.block_until_ready()

    for name, (fn, params) in variants.items():
        out = fn(params, x)
        float(np.asarray(out).ravel()[0])
        print(f"compiled {name}", flush=True)

    results = {name: [] for name in variants}
    for r in range(ROUNDS):
        for name, (fn, params) in variants.items():
            t0 = time.time()
            carry = jnp.zeros(())
            for i in range(ITERS):
                out = fn(params, x + carry * 1e-12 + i * 1e-9)
                carry = out.ravel()[0]
            float(carry)
            dt = time.time() - t0
            results[name].append(dt / ITERS * 1e3)
            print(f"round {r} {name}: {dt / ITERS * 1e3:.2f} ms/call ({B / (dt / ITERS):.0f} img/s)", flush=True)

    print("\n=== medians (ms/call) ===")
    for name, vals in results.items():
        med = statistics.median(vals)
        print(f"{name}: {med:.2f} ms  ({B / med * 1e3:.0f} img/s)  {sorted(round(v, 2) for v in vals)}")


if __name__ == "__main__":
    main()

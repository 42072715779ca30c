"""In-model flash-vs-XLA at the long-sequence shapes (VERDICT r2 #4).

Full ViT forwards (not isolated attention): ViT-B/14 @644 B=4
(config-5, S=2117) and ViT-S/8 @448 B=8 (S=3137 — the shape with the
unexplained 14x in r2's sweep). Interleaved rounds, value-fenced.

Run: timeout 900 python benchmarks/exp_flash_inmodel_long.py
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

ITERS = 8
ROUNDS = 5

CASES = [
    ("dinov2_vit_base_14", 644, 4),
    ("dino_vit_small_8", 448, 8),
]


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--case", type=int, default=-1, help="-1 = all")
    ns = ap.parse_args()
    cases = CASES if ns.case < 0 else [CASES[ns.case]]

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wild_visual_navigation_tpu.models.vit import VIT_CONFIGS, VisionTransformer
    from wild_visual_navigation_tpu.ops.resize import imagenet_normalize

    key = jax.random.PRNGKey(0)
    for cfg_name, size, B in cases:
        cfg = VIT_CONFIGS[cfg_name]
        S = (size // cfg.patch_size) ** 2 + 1
        print(f"\n##### {cfg_name} @{size} B={B} (S={S}, BH={B * cfg.num_heads}) #####", flush=True)
        mk = lambda impl: VisionTransformer(cfg, attention_impl=impl, dtype=jnp.bfloat16, ln_dtype=jnp.bfloat16)
        vit_b = mk("xla_bf16")
        params = vit_b.init(key, jnp.zeros((1, 3, size, size)))
        variants = {
            "xla_bf16": jax.jit(lambda p, x, m=vit_b: m.apply(p, imagenet_normalize(x))["patch_tokens"][:, 0]),
            "flash_default": jax.jit(lambda p, x, m=mk("flash"): m.apply(p, imagenet_normalize(x))["patch_tokens"][:, 0]),
            "flash_384_1152": jax.jit(lambda p, x, m=mk("flash:384:1152"): m.apply(p, imagenet_normalize(x))["patch_tokens"][:, 0]),
        }
        x = jax.random.uniform(jax.random.fold_in(key, 9), (B, 3, size, size))
        x.block_until_ready()

        outs = {}
        for name, fn in variants.items():
            outs[name] = np.asarray(fn(params, x))
            float(outs[name].ravel()[0])
            print(f"compiled {name}", flush=True)
        for n, o in outs.items():
            print(f"max|{n} - xla_bf16| = {np.abs(o - outs['xla_bf16']).max():.5f}", flush=True)

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
            print(f"round {r} done", flush=True)

        print(f"=== {cfg_name} @{size} B={B} medians ===")
        for name, vals in results.items():
            med = statistics.median(vals)
            print(f"{name}: {med:.2f} ms/fwd ({B / med * 1e3:.1f} img/s)  {sorted(round(v, 2) for v in vals)}")


if __name__ == "__main__":
    main()

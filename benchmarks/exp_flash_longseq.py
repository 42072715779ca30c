"""Attention-only shoot-out at long sequences (S=2117, S=3137).

VERDICT r2 #4: the flash kernel's proven win is the ~single-tile
pocket (512 <= S <= 1536); at S=3137 a 14x slowdown was recorded with
no diagnosis, and the flagship config-5 shape (ViT-B/14 @644 ->
S=2117) gets nothing from it. This experiment measures the isolated
attention op across block configurations to (a) find a winning config
past S=1536 and (b) localize the anomaly.

Shapes (both BH=48, head_dim 64):
  * (B=4,  H=12, S=2117) — 4-camera ViT-B/14 @644 (config 5);
  * (B=8,  H=6,  S=3137) — ViT-S/8 @448.

Method: interleaved rounds, carry-chained iterations, value fence,
medians (see bench.py docstring for why).

Run: timeout 900 python benchmarks/exp_flash_longseq.py [--shape 2117|3137]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

ITERS = 10
ROUNDS = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, default=0, help="0 = both")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wild_visual_navigation_tpu.ops.flash_attention import (
        flash_attention,
        xla_attention_bf16,
    )

    shapes = {
        2117: (4, 12, 2117, 64),
        3137: (8, 6, 3137, 64),
    }
    if args.shape:
        shapes = {args.shape: shapes[args.shape]}

    key = jax.random.PRNGKey(0)
    for S, (B, H, _, D) in shapes.items():
        scale = D ** -0.5
        q = jax.random.normal(jax.random.fold_in(key, 1), (B, H, S, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 2), (B, H, S, D), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 3), (B, H, S, D), jnp.bfloat16)
        jax.block_until_ready((q, k, v))

        def fl(bq, bk):
            return jax.jit(lambda q, k, v: flash_attention(q, k, v, sm_scale=scale, block_q=bq, block_k=bk))

        variants = {
            "xla_bf16": jax.jit(lambda q, k, v: xla_attention_bf16(q, k, v, sm_scale=scale)),
            "flash_default": jax.jit(lambda q, k, v: flash_attention(q, k, v, sm_scale=scale)),
            "flash_576x576": fl(576, 576),
            "flash_768x768": fl(768, 768),
            "flash_1152x1152": fl(1152, 1152),
            "flash_fullq_x384": fl(4096, 384),  # clamped to padded S -> nq=1
            "flash_384x1152": fl(384, 1152),
            "flash_256x256": fl(256, 256),
        }

        outs = {}
        for name, fn in variants.items():
            try:
                o = fn(q, k, v)
                outs[name] = np.asarray(o[0, 0, 0], np.float32)
                float(outs[name].ravel()[0])
                print(f"[S={S}] compiled {name}", flush=True)
            except Exception as e:
                print(f"[S={S}] {name} FAILED: {str(e)[:200]}", flush=True)
                variants[name] = None
        variants = {n: f for n, f in variants.items() if f is not None}
        ref = outs["xla_bf16"]
        for n, o in outs.items():
            print(f"[S={S}] max|{n} - xla_bf16| = {np.abs(o - ref).max():.5f}", flush=True)

        results = {name: [] for name in variants}
        for r in range(ROUNDS):
            for name, fn in variants.items():
                t0 = time.time()
                carry = jnp.zeros((), jnp.bfloat16)
                for i in range(ITERS):
                    out = fn(q + carry * 1e-3, k, v)
                    carry = out[0, 0, 0, 0]
                float(carry)
                dt = time.time() - t0
                results[name].append(dt / ITERS * 1e3)
            print(f"[S={S}] round {r} done", flush=True)

        print(f"\n=== S={S} (B={B}, H={H}) medians ===")
        for name, vals in results.items():
            med = statistics.median(vals)
            print(f"{name}: {med:.2f} ms  {sorted(round(v, 2) for v in vals)}")
        print(flush=True)


if __name__ == "__main__":
    main()

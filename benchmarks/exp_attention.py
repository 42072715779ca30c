"""Attention-impl experiment at the flagship shape (B16, H6, S1025, D64).

The full-pipeline sweep showed the ViT forward bound well below the
chip's sustained matmul rate; the prime suspect is attention's fp32
(B, H, S, S) score materialization (~400 MB HBM round trip per layer at
batch 16). Compares, value-fenced interleaved medians:

  * xla            — einsum + softmax (current default)
  * ours(bq, bk)   — ops/flash_attention.py at several block sizes
  * jax_flash      — jax.experimental.pallas.ops.tpu.flash_attention
                     (padded to 1152 with segment-id masking)

Run: timeout 900 python benchmarks/exp_attention.py
"""

from __future__ import annotations

import functools
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

B, H, S, D = 16, 6, 1025, 64
ITERS = 30
ROUNDS = 3


def main():
    import jax
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.ops.flash_attention import flash_attention, xla_attention

    scale = D**-0.5

    variants = {"xla": jax.jit(lambda q, k, v: xla_attention(q, k, v, sm_scale=scale))}

    for bq, bk in [(128, 512), (256, 256), (256, 512), (512, 512), (128, 1024), (512, 1024)]:
        variants[f"ours_q{bq}_k{bk}"] = jax.jit(
            functools.partial(flash_attention, sm_scale=scale, block_q=bq, block_k=bk)
        )

    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            SegmentIds,
            flash_attention as jax_flash,
        )

        SP = 1152  # 9 * 128

        @jax.jit
        def official(q, k, v):
            pad = SP - S
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
            kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
            ids = (jnp.arange(SP) < S).astype(jnp.int32)[None].repeat(B, 0)
            bs = BlockSizes(
                block_q=128, block_k_major=128, block_k=128, block_b=1,
                block_q_major_dkv=128, block_k_major_dkv=128, block_k_dkv=128,
                block_q_dkv=128, block_k_major_dq=128, block_k_dq=128, block_q_dq=128,
            )
            out = jax_flash(qp, kp, vp, segment_ids=SegmentIds(q=ids, kv=ids),
                            sm_scale=scale, block_sizes=bs)
            return out[:, :, :S]

        variants["jax_flash"] = official
    except Exception as e:  # pragma: no cover
        print("official flash unavailable:", e)

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(jax.random.fold_in(key, 0), (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, S, D), jnp.bfloat16)
    jax.block_until_ready((q, k, v))

    ok = {}
    ref = None
    for name, fn in list(variants.items()):
        try:
            out = fn(q, k, v)
            out = np.asarray(out, np.float32)
            if name == "xla":
                ref = out
            err = float(np.abs(out - ref).max()) if ref is not None else 0.0
            ok[name] = fn
            print(f"compiled {name}; max|diff vs xla| = {err:.4f}", flush=True)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    results = {name: [] for name in ok}
    for r in range(ROUNDS):
        for name, fn in ok.items():
            t0 = time.time()
            carry = jnp.zeros((), jnp.bfloat16)
            for i in range(ITERS):
                out = fn(q + carry * 1e-3, k, v)
                carry = out[0, 0, 0, 0]
            float(carry)
            dt = time.time() - t0
            results[name].append(dt / ITERS * 1e3)
            print(f"round {r} {name}: {dt / ITERS * 1e3:.2f} ms/call", flush=True)

    print("\n=== medians (ms/call, lower better) ===")
    for name, vals in results.items():
        print(f"{name}: {statistics.median(vals):.2f} ms  {sorted(round(v, 2) for v in vals)}")


if __name__ == "__main__":
    main()

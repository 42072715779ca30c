"""Roofline probe: what do ViT-S-shaped matmuls sustain on this chip?

Chains 12 blocks of the exact transformer matmul shapes (M=16400 rows,
D=384: qkv/proj/fc1/fc2 — 696 GFLOP total, == ViT-S/14 B16 @448
matmul work) with NO attention/layernorm, vs a 2048^3 control that is
known to sustain ~158 TFLOP/s. If the ViT-shaped chain also caps well
below the control, the backbone is near its realistic ceiling and the
bench number needs a roofline note, not more tuning.

Run: timeout 600 python benchmarks/exp_matmul_shapes.py
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

ITERS = 10
ROUNDS = 3


def main():
    import jax
    import jax.numpy as jnp

    M, D = 16400, 384
    key = jax.random.PRNGKey(0)
    Wqkv = jax.random.normal(jax.random.fold_in(key, 1), (D, 3 * D), jnp.bfloat16) * 0.02
    Wproj = jax.random.normal(jax.random.fold_in(key, 2), (D, D), jnp.bfloat16) * 0.02
    W1 = jax.random.normal(jax.random.fold_in(key, 3), (D, 4 * D), jnp.bfloat16) * 0.02
    W2 = jax.random.normal(jax.random.fold_in(key, 4), (4 * D, D), jnp.bfloat16) * 0.02

    @jax.jit
    def vit_shapes(x):
        for _ in range(12):
            q = x @ Wqkv
            x = (q[:, :D] + q[:, D : 2 * D] * 1e-3 + q[:, 2 * D :] * 1e-6) @ Wproj + x
            h = jax.nn.gelu(x @ W1)
            x = h @ W2 + x
        return x

    N = 2048
    A = jax.random.normal(jax.random.fold_in(key, 5), (N, N), jnp.bfloat16)
    Bm = jax.random.normal(jax.random.fold_in(key, 6), (N, N), jnp.bfloat16) * 0.01

    @jax.jit
    def control(x):
        for _ in range(40):
            x = (x @ Bm) * 0.1 + x * 0.01
        return x

    flops = {
        "vit_shapes": 2 * M * D * (3 * D + D + 4 * D + 4 * D) * 12,
        "control": 2 * N * N * N * 40,
    }
    inputs = {
        "vit_shapes": jax.random.normal(jax.random.fold_in(key, 7), (M, D), jnp.bfloat16),
        "control": jax.random.normal(jax.random.fold_in(key, 8), (N, N), jnp.bfloat16),
    }
    fns = {"vit_shapes": vit_shapes, "control": control}

    for name, fn in fns.items():
        out = fn(inputs[name])
        float(out[0, 0].astype(jnp.float32))
        print(f"compiled {name} ({flops[name]/1e9:.0f} GFLOP/call)", flush=True)

    results = {name: [] for name in fns}
    for r in range(ROUNDS):
        for name, fn in fns.items():
            x = inputs[name]
            t0 = time.time()
            for _ in range(ITERS):
                x = fn(x) * 1e-3 + inputs[name]
            float(x[0, 0].astype(jnp.float32))
            dt = (time.time() - t0) / ITERS
            tf = flops[name] / dt / 1e12
            results[name].append(tf)
            print(f"round {r} {name}: {dt*1e3:.2f} ms/call = {tf:.1f} TFLOP/s", flush=True)

    print("\n=== medians ===")
    for name, vals in results.items():
        print(f"{name}: {statistics.median(vals):.1f} TFLOP/s  {sorted(round(v,1) for v in vals)}")


if __name__ == "__main__":
    main()

"""Perf experiment: batch-size / dtype sweep for the flagship pipeline.

Value-fenced interleaved-median protocol (see bench.py): base inputs
are generated ON DEVICE once (uploading hundreds of MB through the
remote-TPU tunnel dominated earlier runs); the carry data-dependency
makes every iteration's effective input unique so the relay cannot
memoize; the timing is fenced by a value download; the first
measurement is discarded; variants are interleaved over rounds and
medians compared.

Run: timeout 900 python benchmarks/exp_perf_sweep.py
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

SIZE = 448
ITERS = 16
ROUNDS = 3


def main():
    import jax
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.models import get_model
    from wild_visual_navigation_tpu.models.vit import dense_features, make_vit
    from wild_visual_navigation_tpu.ops.resize import imagenet_normalize

    vit = make_vit("dinov2", "vit_small", 14, attention_impl="xla")
    key = jax.random.PRNGKey(0)
    vit_params = vit.init(key, jnp.zeros((1, 3, SIZE, SIZE)))
    D = vit.cfg.embed_dim
    mlp32 = get_model({
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [256, 32, 1], "reconstruction": True},
    })
    mlp16 = get_model({
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [256, 32, 1], "reconstruction": True,
                            "dtype": jnp.bfloat16},
    })
    mlp_params = mlp32.init(jax.random.PRNGKey(1), jnp.zeros((1, D)))

    def make_pipeline(mlp, bf16_feat):
        @jax.jit
        def pipeline(vp, mp, imgs):
            x = imagenet_normalize(imgs)
            feat = dense_features(vit, vp, x)  # (B, D, Hp, Wp) fp32
            B, Dd, Hp, Wp = feat.shape
            flat = feat.transpose(0, 2, 3, 1).reshape(-1, Dd)
            if bf16_feat:
                flat = flat.astype(jnp.bfloat16)
            out = mlp.apply(mp, flat)
            return out[:, 0].reshape(B, Hp, Wp)

        return pipeline

    @jax.jit
    def vit_only(vp, imgs):
        x = imagenet_normalize(imgs)
        feat = dense_features(vit, vp, x)
        return feat[:, 0]

    pipe32 = make_pipeline(mlp32, False)
    pipe16 = make_pipeline(mlp16, True)

    variants = {
        "b16_fp32head": (pipe32, 16, True),
        "b32_fp32head": (pipe32, 32, True),
        "b64_fp32head": (pipe32, 64, True),
        "b32_bf16head": (pipe16, 32, True),
        "b32_vit_only": (vit_only, 32, False),
    }

    # ONE on-device base batch per batch size (no host uploads).
    gen = jax.jit(lambda k, b: jax.random.uniform(k, (b, 3, SIZE, SIZE)), static_argnums=1)
    base = {}
    for batch in (16, 32, 64):
        base[batch] = gen(jax.random.fold_in(key, batch), batch)
        base[batch].block_until_ready()
        print(f"generated base batch b{batch}", flush=True)

    # compile + discard-first
    for name, (fn, batch, with_mlp) in variants.items():
        args = (vit_params, mlp_params, base[batch]) if with_mlp else (vit_params, base[batch])
        out = fn(*args)
        float(np.asarray(out).ravel()[0])
        print(f"compiled {name}", flush=True)

    results = {name: [] for name in variants}
    for r in range(ROUNDS):
        for name, (fn, batch, with_mlp) in variants.items():
            t0 = time.time()
            carry = jnp.zeros(())
            for i in range(ITERS):
                b = base[batch] + carry * 1e-12 + i * 1e-9
                args = (vit_params, mlp_params, b) if with_mlp else (vit_params, b)
                out = fn(*args)
                carry = out.ravel()[0]
            float(carry)
            dt = time.time() - t0
            results[name].append(ITERS * batch / dt)
            print(f"round {r} {name}: {ITERS * batch / dt:.1f} img/s", flush=True)

    print("\n=== medians ===")
    for name, vals in results.items():
        print(f"{name}: {statistics.median(vals):.1f} img/s  {sorted(round(v,1) for v in vals)}")


if __name__ == "__main__":
    main()

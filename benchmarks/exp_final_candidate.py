"""Final bench-candidate sweep: perf-profile ViT (xla_bf16 attention +
bf16 LN) x {plain b16/b32, scan4_b32}, vs the fp32-LN xla control.

Run: timeout 900 python benchmarks/exp_final_candidate.py
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

SIZE = 448
ITERS = 12
ROUNDS = 3


def main():
    import jax
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.models import get_model
    from wild_visual_navigation_tpu.models.vit import dense_features, make_vit
    from wild_visual_navigation_tpu.ops.resize import imagenet_normalize

    key = jax.random.PRNGKey(0)
    vit_ctrl = make_vit("dinov2", "vit_small", 14, attention_impl="xla_bf16", ln_dtype=jnp.bfloat16)
    vit_perf = make_vit("dinov2", "vit_small", 14, attention_impl="flash", ln_dtype=jnp.bfloat16)
    params = vit_ctrl.init(key, jnp.zeros((1, 3, SIZE, SIZE)))
    D = vit_ctrl.cfg.embed_dim
    mlp = get_model({
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [256, 32, 1], "reconstruction": True,
                            "dtype": jnp.bfloat16},
    })
    mlp_params = mlp.init(jax.random.PRNGKey(1), jnp.zeros((1, D)))

    def one_batch(vit):
        def f(vp, mp, imgs):
            x = imagenet_normalize(imgs)
            feat = dense_features(vit, vp, x)
            B, Dd, Hp, Wp = feat.shape
            flat = feat.transpose(0, 2, 3, 1).reshape(-1, Dd).astype(jnp.bfloat16)
            out = mlp.apply(mp, flat)
            return out[:, 0].reshape(B, Hp, Wp)

        return f

    def scan4(vit):
        ob = one_batch(vit)

        @jax.jit
        def f(vp, mp, imgs):  # (4, B, 3, H, W)
            def body(carry, im):
                t = ob(vp, mp, im + carry * 1e-12)
                return t[0, 0, 0], t[:, 0, 0]

            _, outs = jax.lax.scan(body, jnp.zeros(()), imgs)
            return outs

        return f

    variants = {
        "xlabf16_scan4_b32": (scan4(vit_ctrl), (4, 32)),
        "flash_scan4_b32": (scan4(vit_perf), (4, 32)),
        "flash_scan3_b48": (scan4(vit_perf), (3, 48)),
        "flash_scan2_b64": (scan4(vit_perf), (2, 64)),
        "flash_scan6_b48": (scan4(vit_perf), (6, 48)),
    }

    gen = jax.jit(lambda k, shape: jax.random.uniform(k, shape + (3, SIZE, SIZE)), static_argnums=1)
    inputs = {n: gen(jax.random.fold_in(key, i), s) for i, (n, (f, s)) in enumerate(variants.items())}
    jax.block_until_ready(list(inputs.values()))

    for name, (fn, shape) in variants.items():
        out = fn(params, mlp_params, inputs[name])
        float(np.asarray(out).ravel()[0])
        print(f"compiled {name}", flush=True)

    results = {name: [] for name in variants}
    for r in range(ROUNDS):
        for name, (fn, shape) in variants.items():
            n_img = int(np.prod(shape))
            t0 = time.time()
            carry = jnp.zeros(())
            for i in range(ITERS):
                out = fn(params, mlp_params, inputs[name] + carry * 1e-12 + i * 1e-9)
                carry = out.ravel()[0]
            float(carry)
            dt = time.time() - t0
            results[name].append(ITERS * n_img / dt)
            print(f"round {r} {name}: {ITERS * n_img / dt:.1f} img/s", flush=True)

    print("\n=== medians (img/s) ===")
    for name, vals in results.items():
        print(f"{name}: {statistics.median(vals):.1f}  {sorted(round(v, 1) for v in vals)}")


if __name__ == "__main__":
    main()

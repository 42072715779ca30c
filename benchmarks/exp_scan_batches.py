"""Does scanning K batches inside ONE program amortize the ~11 ms
fixed per-dispatch cost seen in exp_vit_breakdown?

Variants: plain b16 (control), scan{2,4}xb16, scan4xb32.
Value-fenced interleaved medians; inputs generated on device.

Run: timeout 900 python benchmarks/exp_scan_batches.py
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

    vit = make_vit("dinov2", "vit_small", 14, attention_impl="xla")
    key = jax.random.PRNGKey(0)
    vit_params = vit.init(key, jnp.zeros((1, 3, SIZE, SIZE)))
    D = vit.cfg.embed_dim
    mlp = get_model({
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [256, 32, 1], "reconstruction": True},
    })
    mlp_params = mlp.init(jax.random.PRNGKey(1), jnp.zeros((1, D)))

    def one_batch(vp, mp, imgs):
        x = imagenet_normalize(imgs)
        feat = dense_features(vit, vp, x)
        B, Dd, Hp, Wp = feat.shape
        flat = feat.transpose(0, 2, 3, 1).reshape(-1, Dd)
        out = mlp.apply(mp, flat)
        return out[:, 0].reshape(B, Hp, Wp)

    plain = jax.jit(one_batch)

    def make_scan(k):
        @jax.jit
        def scan_fn(vp, mp, imgs):  # (K, B, 3, H, W)
            def body(carry, im):
                t = one_batch(vp, mp, im + carry * 1e-12)
                return t[0, 0, 0], t[:, 0, 0]

            last, outs = jax.lax.scan(body, jnp.zeros(()), imgs)
            return outs

        return scan_fn

    variants = {
        "plain_b16": (plain, (16,)),
        "scan2_b16": (make_scan(2), (2, 16)),
        "scan4_b16": (make_scan(4), (4, 16)),
        "scan4_b32": (make_scan(4), (4, 32)),
    }

    gen = jax.jit(
        lambda k, shape: jax.random.uniform(k, shape + (3, SIZE, SIZE)),
        static_argnums=1,
    )
    inputs = {}
    for name, (fn, shape) in variants.items():
        inputs[name] = gen(jax.random.fold_in(key, hash(name) % 1000), shape)
        inputs[name].block_until_ready()

    for name, (fn, shape) in variants.items():
        out = fn(vit_params, mlp_params, inputs[name])
        float(np.asarray(out).ravel()[0])
        print(f"compiled {name}", flush=True)

    results = {name: [] for name in variants}
    for r in range(ROUNDS):
        for name, (fn, shape) in variants.items():
            n_img = int(np.prod(shape))
            t0 = time.time()
            carry = jnp.zeros(())
            for i in range(ITERS):
                out = fn(vit_params, mlp_params, inputs[name] + carry * 1e-12 + i * 1e-9)
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

"""Where does the pixelwise path's time go? (post-MXU-bilinear)

At 249 img/s the pixelwise pipeline spends ~4.0 ms/img vs ~1.45 for
patchres — ~2.6 ms on upsample + 200k-row MLP + confidence. Variants
isolate the components:

  full        — upsample 384ch + MLP + trav + confidence (the bench)
  trav_only   — drop the confidence map (reco MSE + calibration)
  early_dense — Dense_0 at PATCH res, upsample the 256-ch hidden
                preactivations (exact by linearity), ReLU + rest at
                pixels; trav-only
  backbone    — backbone alone at the same batch/scan (floor)

Run: timeout 900 python benchmarks/exp_pixelwise_variants.py
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

SIZE = 448
BATCH, SCAN, ITERS, ROUNDS = 4, 2, 10, 4


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wild_visual_navigation_tpu.models import get_model
    from wild_visual_navigation_tpu.models.vit import dense_features, fold_imagenet_normalize, make_vit
    from wild_visual_navigation_tpu.ops.resize import interpolate_bilinear_mxu
    from wild_visual_navigation_tpu.utils.confidence_generator import (
        ConfidenceConfig,
        confidence_inference,
        confidence_init,
    )

    vit = make_vit("dinov2", "vit_small", 14, attention_impl="flash", ln_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    vp = fold_imagenet_normalize(vit.init(key, jnp.zeros((1, 3, SIZE, SIZE))))
    D = vit.cfg.embed_dim
    mlp = get_model({
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [256, 32, 1], "reconstruction": True,
                            "dtype": jnp.bfloat16},
    })
    mp = mlp.init(jax.random.PRNGKey(1), jnp.zeros((1, D)))
    cg_cfg = ConfidenceConfig()
    cg = confidence_init()

    def full(vpar, mpar, imgs):
        feat = dense_features(vit, vpar, imgs)
        dense = interpolate_bilinear_mxu(feat.astype(jnp.bfloat16), SIZE, SIZE)
        B = dense.shape[0]
        flat = dense.transpose(0, 2, 3, 1).reshape(-1, D)
        out = mlp.apply(mpar, flat)
        trav = out[:, 0].reshape(B, SIZE, SIZE)
        reco = jnp.mean((out[:, 1:] - flat.astype(jnp.float32)) ** 2, axis=-1)
        conf = confidence_inference(cg_cfg, cg, reco).reshape(B, SIZE, SIZE)
        return trav + conf * 1e-9

    def trav_only(vpar, mpar, imgs):
        feat = dense_features(vit, vpar, imgs)
        dense = interpolate_bilinear_mxu(feat.astype(jnp.bfloat16), SIZE, SIZE)
        B = dense.shape[0]
        flat = dense.transpose(0, 2, 3, 1).reshape(-1, D)
        out = mlp.apply(mpar, flat)
        return out[:, 0].reshape(B, SIZE, SIZE)

    def early_dense(vpar, mpar, imgs):
        # Dense_0 commutes with the (linear, per-channel) bilinear
        # upsample: apply it at patch res, upsample the 256-ch hidden
        # preactivations, then the nonlinear rest per pixel. Exact
        # modulo fp order.
        feat = dense_features(vit, vpar, imgs)  # (B, D, Hp, Wp)
        p = mpar["params"]
        W0 = p["Dense_0"]["kernel"].astype(jnp.bfloat16)
        b0 = p["Dense_0"]["bias"].astype(jnp.bfloat16)
        h = jnp.einsum("bdhw,dk->bkhw", feat.astype(jnp.bfloat16), W0) + b0[None, :, None, None]
        h = interpolate_bilinear_mxu(h, SIZE, SIZE)  # (B, 256, H, W)
        h = jax.nn.relu(h)
        B = h.shape[0]
        flat = h.transpose(0, 2, 3, 1).reshape(-1, h.shape[1])
        h1 = jax.nn.relu(flat @ p["Dense_1"]["kernel"].astype(jnp.bfloat16)
                         + p["Dense_1"]["bias"].astype(jnp.bfloat16))
        trav = jax.nn.sigmoid(
            (h1 @ p["Dense_2"]["kernel"][:, :1].astype(jnp.bfloat16)
             + p["Dense_2"]["bias"][:1].astype(jnp.bfloat16)).astype(jnp.float32)
        )
        return trav.reshape(B, SIZE, SIZE)

    def backbone(vpar, mpar, imgs):
        feat = dense_features(vit, vpar, imgs)
        return feat[:, 0]

    def full_opt(vpar, mpar, imgs):
        """Exact pixelwise math incl. confidence, restructured:
        Dense_0 at patch res (linearity), upsample 256-ch hidden +
        384-ch features, remaining layers + reco MSE entirely in bf16
        rows (fp32 accumulation) — no 385-wide fp32 materialization."""
        feat = dense_features(vit, vpar, imgs)  # (B, D, Hp, Wp)
        p = mpar["params"]
        W0 = p["Dense_0"]["kernel"].astype(jnp.bfloat16)
        b0 = p["Dense_0"]["bias"].astype(jnp.bfloat16)
        h = jnp.einsum("bdhw,dk->bkhw", feat.astype(jnp.bfloat16), W0) + b0[None, :, None, None]
        h = jax.nn.relu(interpolate_bilinear_mxu(h, SIZE, SIZE))  # (B, 256, H, W)
        xup = interpolate_bilinear_mxu(feat.astype(jnp.bfloat16), SIZE, SIZE)  # (B, 384, H, W)
        B = h.shape[0]
        rows = h.transpose(0, 2, 3, 1).reshape(-1, h.shape[1])
        xrows = xup.transpose(0, 2, 3, 1).reshape(-1, D)
        h1 = jax.nn.relu(rows @ p["Dense_1"]["kernel"].astype(jnp.bfloat16)
                         + p["Dense_1"]["bias"].astype(jnp.bfloat16))
        W2 = p["Dense_2"]["kernel"].astype(jnp.bfloat16)
        b2 = p["Dense_2"]["bias"].astype(jnp.bfloat16)
        out = h1 @ W2 + b2  # (N, 385) bf16
        trav = jax.nn.sigmoid(out[:, 0].astype(jnp.float32)).reshape(B, SIZE, SIZE)
        diff = out[:, 1:] - xrows
        reco = jnp.einsum("nd,nd->n", diff, diff, preferred_element_type=jnp.float32) / D
        conf = confidence_inference(cg_cfg, cg, reco).reshape(B, SIZE, SIZE)
        return trav + conf * 1e-9

    def scanned(fn):
        @jax.jit
        def pipe(vpar, mpar, imgs):
            def body(carry, im):
                t = fn(vpar, mpar, im + carry * 1e-12)
                return t.reshape(-1)[0], t.reshape(-1)[0]

            _, outs = jax.lax.scan(body, jnp.zeros(()), imgs)
            return outs

        return pipe

    variants = {n: scanned(f) for n, f in
                [("full", full), ("full_opt", full_opt), ("trav_only", trav_only),
                 ("early_dense", early_dense), ("backbone", backbone)]}
    gen = jax.jit(lambda: jax.random.uniform(jax.random.fold_in(key, 7), (SCAN, BATCH, 3, SIZE, SIZE)))
    base = gen()
    base.block_until_ready()
    print("inputs ready on device", flush=True)

    # numerics: early_dense must equal trav_only
    t1 = np.asarray(jax.jit(trav_only)(vp, mp, base[0]))
    print("trav_only compiled", flush=True)
    t2 = np.asarray(jax.jit(early_dense)(vp, mp, base[0]))
    print("early_dense compiled", flush=True)
    print(f"max|early_dense - trav_only| = {np.abs(t1 - t2).max():.5f} (bf16 floor expected)", flush=True)
    f1 = np.asarray(jax.jit(full)(vp, mp, base[0]))
    f2 = np.asarray(jax.jit(full_opt)(vp, mp, base[0]))
    print(f"max|full_opt - full| = {np.abs(f1 - f2).max():.5f} (bf16 floor expected)", flush=True)

    for n, f in variants.items():
        float(f(vp, mp, base)[0])
        print("compiled", n, flush=True)

    res = {n: [] for n in variants}
    for r in range(ROUNDS):
        for n, f in variants.items():
            t0 = time.time()
            carry = jnp.zeros(())
            for i in range(ITERS):
                out = f(vp, mp, base + carry * 1e-12 + i * 1e-9)
                carry = out.ravel()[0]
            float(carry)
            dt = time.time() - t0
            res[n].append(ITERS * SCAN * BATCH / dt)
        print(f"round {r} done", flush=True)

    print("\n=== img/s medians ===")
    for n, vals in res.items():
        print(f"{n}: {statistics.median(vals):.1f}  {sorted(round(v) for v in vals)}")


if __name__ == "__main__":
    main()

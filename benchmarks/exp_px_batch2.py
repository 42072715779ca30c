"""Round-4 re-pin of the pixelwise batch/scan choice (VERDICT r3 #10).

The r3 sweep (exp_px_batch.py) picked B=48; the r4 decomposition
(exp_px_decompose.py) showed the fused scorer now costs only
~0.11 ms/img while the BACKBONE is ~0.22 ms/img faster at B=16
(the flash kernel's 1152-tile economics favor smaller batches).
This sweep interleaves backbone-only (bb) and the full pixelwise
pipeline (px) across (B, SCAN) configs to pick the r4 headline shape.

Run: timeout 900 python benchmarks/exp_px_batch2.py
"""

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from wild_visual_navigation_tpu.models import get_model
from wild_visual_navigation_tpu.models.vit import dense_features, fold_imagenet_normalize, make_vit
from wild_visual_navigation_tpu.ops.pixelwise import pixelwise_score
from wild_visual_navigation_tpu.utils.confidence_generator import ConfidenceConfig, confidence_init

SIZE = 448


def main():
    vit = make_vit("dinov2", "vit_small", 14, attention_impl="flash", ln_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    vp = fold_imagenet_normalize(vit.init(key, jnp.zeros((1, 3, SIZE, SIZE))))
    D = vit.cfg.embed_dim
    mlp = get_model({"name": "SimpleMLP",
                     "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [256, 32, 1],
                                        "reconstruction": True, "dtype": jnp.bfloat16}})
    mp = mlp.init(jax.random.PRNGKey(1), jnp.zeros((1, D)))
    cfg, st = ConfidenceConfig(), confidence_init()

    def make(B, SCAN, full):
        def one(vpp, mpp, imgs):
            feat = dense_features(vit, vpp, imgs)
            if not full:
                return feat[:, 0, 0, 0], feat[:, 0, 0, 0]
            return pixelwise_score(mpp, feat, SIZE, SIZE, cfg, st, optimized=True)

        @jax.jit
        def pipeline(vpp, mpp, imgs):
            def body(carry, im):
                t, c = one(vpp, mpp, im + carry * 1e-12)
                t = t if t.ndim == 1 else t[:, 0, 0]
                c = c if c.ndim == 1 else c[:, 0, 0]
                return t[0] + c[0], t

            _, outs = jax.lax.scan(body, jnp.zeros(()), imgs)
            return outs[0]

        return pipeline

    configs = [(16, 1), (16, 3), (24, 2), (32, 1), (32, 2), (48, 1)]
    pipes = {}
    for B, SCAN in configs:
        n_img = B * SCAN
        iters = max(3, 360 // n_img)
        for full in (False, True):
            g = jax.jit(lambda k=B, s=SCAN: jax.random.uniform(
                jax.random.fold_in(key, k * 100 + s), (s, k, 3, SIZE, SIZE)))
            pipes[(B, SCAN, full)] = (make(B, SCAN, full), g, iters)

    for kk, (p, g, _) in pipes.items():
        float(jnp.asarray(p(vp, mp, g())).ravel()[0])

    results = {k: [] for k in pipes}
    for rnd in range(4):
        for (B, SCAN, full), (p, g, iters) in pipes.items():
            base = g()
            t0 = time.time()
            carry = jnp.zeros(())
            for i in range(iters):
                out = p(vp, mp, base + carry * 1e-12 + i * 1e-9)
                carry = jnp.asarray(out).ravel()[0]
            float(carry)
            dt = time.time() - t0
            if rnd > 0:
                results[(B, SCAN, full)].append(iters * B * SCAN / dt)

    print()
    for B, SCAN in configs:
        bb = statistics.median(results[(B, SCAN, False)])
        px = statistics.median(results[(B, SCAN, True)])
        print(f"B={B:3d} SCAN={SCAN}: bb {bb:7.1f} img/s  px {px:7.1f} img/s  "
              f"scorer {+1e3 / px - 1e3 / bb:.3f} ms/img  "
              f"rounds_px={[round(x, 1) for x in results[(B, SCAN, True)]]}")


if __name__ == "__main__":
    main()

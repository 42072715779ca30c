"""Does a larger pixelwise batch help now that the fused scorer keeps
pixel-resolution tensors out of HBM? (PX_BATCH was sized at 8 for the
gram path's ~390 MB/frame intermediates.)

Run: timeout 900 python benchmarks/exp_px_batch.py
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

    def make_pipeline(B, SCAN):
        def one(vpp, mpp, imgs):
            feat = dense_features(vit, vpp, imgs)
            return pixelwise_score(mpp, feat, SIZE, SIZE, cfg, st, optimized=True)

        @jax.jit
        def pipeline(vpp, mpp, imgs):
            def body(carry, im):
                t, c = one(vpp, mpp, im + carry * 1e-12)
                return t[0, 0, 0] + c[0, 0, 0], (t[:, 0, 0], c[:, 0, 0])
            _, outs = jax.lax.scan(body, jnp.zeros(()), imgs)
            return outs[0]
        return pipeline

    variants = [(8, 2, 8), (16, 2, 6), (32, 1, 8), (48, 1, 6), (64, 1, 5), (96, 1, 4)]
    pipes = {}
    for B, SCAN, ITERS in variants:
        pipes[(B, SCAN)] = (make_pipeline(B, SCAN),
                            jax.jit(lambda k=B, s=SCAN: jax.random.uniform(
                                jax.random.fold_in(key, k * 100 + s), (s, k, 3, SIZE, SIZE))),
                            ITERS)
    # warmup/compile all
    for (B, SCAN), (p, g, _) in pipes.items():
        float(jnp.asarray(p(vp, mp, g())).ravel()[0])

    results = {k: [] for k in pipes}
    for rnd in range(4):
        for (B, SCAN), (p, g, ITERS) in pipes.items():
            base = g()
            t0 = time.time()
            carry = jnp.zeros(())
            for i in range(ITERS):
                out = p(vp, mp, base + carry * 1e-12 + i * 1e-9)
                carry = jnp.asarray(out).ravel()[0]
            float(carry)
            dt = time.time() - t0
            if rnd > 0:
                results[(B, SCAN)].append(ITERS * B * SCAN / dt)
    for k, v in results.items():
        print(f"B={k[0]:3d} SCAN={k[1]}: {statistics.median(v):7.1f} img/s  rounds={[round(x,1) for x in v]}")


if __name__ == "__main__":
    main()

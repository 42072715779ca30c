"""Does the W8A8 backbone win at ViT-B @644 (config-5 shape)?

At ViT-S @448 int8 LOSES (565 vs 689 img/s): the softmax exp VPU floor
dominates and dynamic-quant reductions cost more than the halved MXU
time. ViT-B @644 has 4x the matmul FLOPs per token and S=2117, so the
MXU fraction is much higher — the int8 economics may flip.

Run: timeout 1200 python benchmarks/exp_int8_vitb.py
"""
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from wild_visual_navigation_tpu.models.vit import dense_features, fold_imagenet_normalize, make_vit

SIZE = 644
B = 4  # config-5 camera count


def main():
    key = jax.random.PRNGKey(0)
    vit = make_vit("dinov2", "vit_base", 14, attention_impl="flash", ln_dtype=jnp.bfloat16)
    vp = fold_imagenet_normalize(vit.init(key, jnp.zeros((1, 3, SIZE, SIZE))))
    vit_i8 = make_vit("dinov2", "vit_base", 14, attention_impl="flash",
                      ln_dtype=jnp.bfloat16, quant="int8")

    def mk(vitmod):
        @jax.jit
        def f(p, imgs):
            feat = dense_features(vitmod, p, imgs)
            return feat[:, 0, 0, 0]
        return f

    pipes = {"bf16": mk(vit), "int8": mk(vit_i8)}
    gen = jax.jit(lambda: jax.random.uniform(key, (B, 3, SIZE, SIZE)))
    base = gen()
    for f in pipes.values():
        float(jnp.asarray(f(vp, base)).ravel()[0])

    ITERS = 10
    res = {k: [] for k in pipes}
    for rnd in range(4):
        for name, f in pipes.items():
            carry = jnp.zeros(())
            t0 = time.time()
            for i in range(ITERS):
                out = f(vp, base + carry * 1e-12 + i * 1e-9)
                carry = out[0]
            float(carry)
            dt = time.time() - t0
            if rnd:
                res[name].append(ITERS * B / dt)
    for k, v in res.items():
        print(f"{k}: {statistics.median(v):7.1f} img/s  rounds={[round(x,1) for x in v]}")


if __name__ == "__main__":
    main()

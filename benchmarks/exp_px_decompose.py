"""Decomposition of the pixelwise headline pipeline (VERDICT r3 #7).

The round-3 headline runs ~620 img/s while the backbone alone runs
~760 — an ~18 % gap. TPU cores execute one program op at a time (no
concurrent kernels; only DMA prefetch overlaps compute), so "overlap
the scorer with the next batch's backbone" buys nothing — the gap
closes only if the scorer itself gets cheaper. This experiment pins
where the scorer's ~0.3 ms/img goes:

  bb    backbone only (dense_features -> scalar)
  pre   backbone + fused_precompute (the XLA patch-resolution stage)
  full  backbone + fused kernel + confidence calibration (the headline)
  head  backbone + patch-token MLP (the patchres fast path, for scale)

Derived: precompute = pre - bb; kernel+conf = full - pre.

Floor estimate for the kernel at 448 px (see ops/pixelwise_fused.py):
  * MXU: W1T (32x256) and GT (33x32) matmuls over 200k pixels
    ~3.7 GFLOP/img at M=32 -> 25 % array utilization -> ~75 us/img;
  * VPU: the 2-tap H-lerp of the K1=256-channel hidden rows is
    448*448*256*2 ~ 103 M bf16 ops/img plus 35 fp32 channels and the
    sigmoid/MSE epilogue -> ~80-120 us/img;
  * HBM: ~12 MB/img operand+output traffic -> ~15 us/img.
So ~0.17-0.21 ms/img is architectural for this math: the per-pixel
hidden-layer lerp and the M=32 matmuls are the reference MLP's own
shape, not implementation slack.

All variants interleaved over rounds, carry-chained, value-fenced
(see bench.py for the relay measurement protocol).

Run: timeout 900 python benchmarks/exp_px_decompose.py
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
from wild_visual_navigation_tpu.ops.pixelwise_fused import fused_precompute
from wild_visual_navigation_tpu.utils.confidence_generator import ConfidenceConfig, confidence_init

SIZE = 448
B = int(__import__("os").environ.get("PX_B", "48"))  # headline batch; override with PX_B
ITERS = 10
ROUNDS = 4  # first discarded


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

    @jax.jit
    def bb(vpp, mpp, imgs):
        feat = dense_features(vit, vpp, imgs)
        return jnp.sum(feat[:, 0, 0, 0])

    @jax.jit
    def pre(vpp, mpp, imgs):
        feat = dense_features(vit, vpp, imgs)
        ops, _ = fused_precompute(mpp, feat, SIZE, SIZE)
        # reduce every kernel operand so none is DCE'd
        return sum(jnp.sum(o[..., 0]).astype(jnp.float32) for o in ops[2:4]) + jnp.sum(ops[0])

    @jax.jit
    def full(vpp, mpp, imgs):
        feat = dense_features(vit, vpp, imgs)
        t, c = pixelwise_score(mpp, feat, SIZE, SIZE, cfg, st, optimized=True)
        return t[0, 0, 0] + c[0, 0, 0]

    @jax.jit
    def head(vpp, mpp, imgs):
        feat = dense_features(vit, vpp, imgs)
        Bf, Dd, Hp, Wp = feat.shape
        flat = feat.transpose(0, 2, 3, 1).reshape(-1, Dd).astype(jnp.bfloat16)
        out = mlp.apply(mpp, flat)
        return out[0, 0]

    variants = {"bb": bb, "pre": pre, "full": full, "head": head}
    gen = jax.jit(lambda: jax.random.uniform(jax.random.fold_in(key, 7), (B, 3, SIZE, SIZE)))
    base = gen()
    for f in variants.values():
        float(jnp.asarray(f(vp, mp, base)).ravel()[0])  # compile

    results = {k: [] for k in variants}
    for rnd in range(ROUNDS):
        for name, f in variants.items():
            t0 = time.time()
            carry = jnp.zeros(())
            for i in range(ITERS):
                out = f(vp, mp, base + carry * 1e-12 + i * 1e-9)
                carry = jnp.asarray(out).ravel()[0]
            float(carry)
            dt = time.time() - t0
            if rnd > 0:
                results[name].append(ITERS * B / dt)

    med = {k: statistics.median(v) for k, v in results.items()}
    ms = {k: 1e3 / v for k, v in med.items()}
    print()
    for k in ("bb", "head", "pre", "full"):
        print(f"{k:5s}: {med[k]:7.1f} img/s  {ms[k]:.3f} ms/img  rounds={[round(x, 1) for x in results[k]]}")
    print()
    print(f"precompute (pre - bb):      {ms['pre'] - ms['bb']:+.3f} ms/img")
    print(f"kernel+conf (full - pre):   {ms['full'] - ms['pre']:+.3f} ms/img")
    print(f"scorer total (full - bb):   {ms['full'] - ms['bb']:+.3f} ms/img")
    print(f"patch head (head - bb):     {ms['head'] - ms['bb']:+.3f} ms/img")


if __name__ == "__main__":
    main()

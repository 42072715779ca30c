"""Benchmark: flagship inference throughput on one chip.

Measures the BASELINE north-star metric (BASELINE.md): images/sec for
the full per-frame pipeline — ImageNet normalize -> DINOv2 ViT-S/14
backbone -> dense per-patch SimpleMLP traversability + reconstruction
scoring — at 448 px on the real TPU. The reference design point is
10 images/sec/camera on an RTX-class GPU (default.yaml:39);
`vs_baseline` is the ratio against that 10 img/s.

Configuration (the TPU perf profile, all covered by tolerance tests):
  * attention_impl="flash" — the Pallas flash kernel with
    padding-tight blocks (one 1152 tile at S=1025) keeps the (S, S)
    scores in VMEM entirely (ops/flash_attention.py; it beats XLA
    fp32 542 -> bf16-scores 646 -> flash ~760 img/s backbone-only);
  * ln_dtype=bfloat16 — bf16 LayerNorm IO (stats still fp32);
  * ImageNet normalization folded into the patch-embed conv weights
    (models/vit.py::fold_imagenet_normalize — exact, equivalence-
    tested), removing two full-image HBM sweeps per frame;
  * bf16 MLP head scoring at patch resolution;
  * batch 32, 4 batches per dispatch via lax.scan (amortizes the
    per-dispatch overhead measured in benchmarks/exp_vit_breakdown.py).

Measurement method (validated with a known-FLOP probe against this
environment's TPU relay, whose block_until_ready can return before
execution completes): on-device generated inputs, every dispatch
chained through a data dependency, timing fenced by an actual value
download, first round discarded, median of 3 rounds reported —
run-to-run contention on the shared relay swings single measurements
up to ~10x (see benchmarks/exp_*.py).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

BASELINE_IMAGES_PER_SEC = 10.0  # reference rate gate per camera
BATCH = 32
SCAN = 4  # batches per dispatch
SIZE = 448
ITERS = 15  # chained dispatches per round (ITERS * SCAN * BATCH images)
ROUNDS = 3

# matmul+attention FLOPs per image: 12 blocks x (12 D^2 per token x S
# + 4 S^2 D attention) + patch embed, S=1025, D=384 -> ~63.5 GFLOP
FLOP_PER_IMAGE = 63.5e9
PEAK_TFLOPS = 197.0  # v5e bf16


def main():
    import jax
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.models import get_model
    from wild_visual_navigation_tpu.models.vit import dense_features, fold_imagenet_normalize, make_vit

    vit = make_vit("dinov2", "vit_small", 14, attention_impl="flash", ln_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    vit_params = fold_imagenet_normalize(vit.init(key, jnp.zeros((1, 3, SIZE, SIZE))))
    D = vit.cfg.embed_dim
    mlp = get_model({
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [256, 32, 1], "reconstruction": True,
                            "dtype": jnp.bfloat16},
    })
    mlp_params = mlp.init(jax.random.PRNGKey(1), jnp.zeros((1, D)))

    def one_batch(vp, mp, imgs):
        feat = dense_features(vit, vp, imgs)  # (B, D, Hp, Wp); raw [0,1] in

        B, Dd, Hp, Wp = feat.shape
        flat = feat.transpose(0, 2, 3, 1).reshape(-1, Dd).astype(jnp.bfloat16)
        out = mlp.apply(mp, flat)
        return out[:, 0].reshape(B, Hp, Wp)

    @jax.jit
    def pipeline(vp, mp, imgs):  # (SCAN, B, 3, H, W)
        def body(carry, im):
            t = one_batch(vp, mp, im + carry * 1e-12)
            return t[0, 0, 0], t[:, 0, 0]

        _, outs = jax.lax.scan(body, jnp.zeros(()), imgs)
        return outs

    gen = jax.jit(lambda k: jax.random.uniform(k, (SCAN, BATCH, 3, SIZE, SIZE)))
    base = gen(jax.random.fold_in(key, 7))
    base.block_until_ready()

    float(pipeline(vit_params, mlp_params, base)[0, 0])  # compile + complete

    rates = []
    for r in range(ROUNDS + 1):
        t0 = time.time()
        carry = jnp.zeros(())
        for i in range(ITERS):
            out = pipeline(vit_params, mlp_params, base + carry * 1e-12 + i * 1e-9)
            carry = out.ravel()[0]
        float(carry)  # value fence: forces true completion through the relay
        dt = time.time() - t0
        if r > 0:  # first round absorbs relay warmup
            rates.append(ITERS * SCAN * BATCH / dt)

    images_per_sec = statistics.median(rates)
    result = {
        "metric": "dinov2_vits14_448px_dense_traversability_throughput",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 2),
        "rounds": [round(x, 1) for x in rates],
        "mfu": round(images_per_sec * FLOP_PER_IMAGE / (PEAK_TFLOPS * 1e12), 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

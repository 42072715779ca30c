"""Torchvision-mode floor decomposition (follow-up to the r4 honest
re-fencing: the mode reads 99.2 img/s at B=4 @448 with every
FrameResult field fenced — this splits the fused program into stages
to find the non-backbone cost).

Stages (all value-fenced, chained; params passed as jit ARGUMENTS so
the serialized HLO stays small):

  1. full          — the production fused frames_batch, all fields fenced
  2. backbone      — resize + normalize + resnet50 pyramid only
  3. slic          — SLIC superpixels alone (100 components, 10 iters)
  4. pyramid_pool  — segment_pyramid_pool on a fixed seg
  5. adj_centers   — adjacency_list (matrix path) + segment_centers on a
                     fixed seg
  6. score         — per-segment MLP + confidence from pooled rows

In-program deltas (full - backbone - slic) are the ground truth; the
small standalone stages carry ~1-4 ms of relay per-dispatch overhead
each (see exp_stego_decompose.py's note).

Run: timeout 1800 python benchmarks/exp_tv_decompose.py
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

SIZE = 448
B = 4
ROUNDS = 4


def measure_ms(fn, params_fn, gen, iters, rounds=None):
    import jax.numpy as jnp

    rounds = ROUNDS if rounds is None else rounds
    base = gen()
    out = fn(*params_fn(), base)
    float(jnp.asarray(out).ravel()[0])
    med = []
    for r in range(rounds):
        carry = jnp.zeros(())
        t0 = time.time()
        for i in range(iters):
            out = fn(*params_fn(), base + carry * 1e-12 + i * 1e-9)
            carry = jnp.asarray(out).ravel()[0]
        float(carry)
        dt = time.time() - t0
        if r > 0:
            med.append(dt / iters * 1e3)
    return round(statistics.median(med), 2)


def _no_params():
    return ()


class _PrintingDict(dict):
    def __setitem__(self, k, v):
        print(f"[stage] {k} = {v}", flush=True)
        super().__setitem__(k, v)


def main():
    global B, ROUNDS
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=B)
    ap.add_argument("--rounds", type=int, default=ROUNDS)
    cli = ap.parse_args()
    B, ROUNDS = cli.batch, cli.rounds

    import jax
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.feature_extractor.torchvision_interface import (
        TorchVisionInterface,
    )
    from wild_visual_navigation_tpu.models import get_model
    from wild_visual_navigation_tpu.ops import segment_ops
    from wild_visual_navigation_tpu.ops.resize import resize_image
    from wild_visual_navigation_tpu.ops.slic import slic
    from wild_visual_navigation_tpu.runtime.fused import (
        build_fused_torchvision_frame_fn,
    )
    from wild_visual_navigation_tpu.utils.confidence_generator import (
        ConfidenceConfig,
        confidence_init,
    )

    results = _PrintingDict()
    results["config"] = f"torchvision_resnet50_448px_B{B}_slic100"

    key = jax.random.PRNGKey(0)
    gen_img = jax.jit(lambda: jax.random.uniform(key, (B, 3, SIZE, SIZE)))

    tv = TorchVisionInterface(model_type="resnet50", input_size=SIZE)
    D_tv = tv.feature_dim
    mlp = get_model({
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": D_tv, "hidden_sizes": [256, 32, 1],
                            "reconstruction": True, "dtype": jnp.bfloat16},
    })
    mp = mlp.init(jax.random.PRNGKey(2), jnp.zeros((1, D_tv)))
    cg_cfg, cg_state = ConfidenceConfig(), confidence_init()
    fused = build_fused_torchvision_frame_fn(tv, mlp, cg_cfg, SIZE, jit_compile=False)

    def fence_all(res):
        vals = (res.traversability, res.confidence, res.features,
                res.feat_valid, res.segments, res.edges, res.edge_valid,
                res.centers)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in vals)

    # ---- 1. full production program ----
    full = jax.jit(lambda tp, mp_, cg_, img: fence_all(
        fused.frames_batch(tp, mp_, cg_, img)))
    results["full_ms"] = measure_ms(
        full, lambda: (tv.params, mp, cg_state), gen_img, iters=10)

    # ---- 2. backbone pyramid only (the fused path's _backbone) ----
    from wild_visual_navigation_tpu.ops.resize import imagenet_normalize

    def backbone(tp, img):
        x = imagenet_normalize(resize_image(img, SIZE, SIZE))
        pyr = tv.model.apply(tp, x)
        return sum(jnp.sum(v[:, 0, 0, 0]) for v in pyr.values())

    results["backbone_ms"] = measure_ms(
        jax.jit(backbone), lambda: (tv.params,), gen_img, iters=10)

    # ---- 3. slic alone ----
    def slic_only(img):
        x = resize_image(img, SIZE, SIZE)
        seg = jax.vmap(lambda xi: slic(xi, num_components=100))(x)
        return jnp.sum(seg)

    results["slic_ms"] = measure_ms(jax.jit(slic_only), _no_params, gen_img, iters=10)

    # ---- 4+5. tail on a fixed seg: pooling / adjacency+centers ----
    x0 = gen_img()
    pyr0 = jax.jit(lambda tp, img: tv.model.apply(
        tp, imagenet_normalize(resize_image(img, SIZE, SIZE))))(tv.params, x0)
    seg0 = jax.jit(lambda img: jax.vmap(
        lambda xi: slic(xi, num_components=100))(resize_image(img, SIZE, SIZE)))(x0)

    def pool_only(g):
        def one(pyr_i, seg_i):
            pooled, _ = segment_ops.segment_pyramid_pool(pyr_i, seg_i, 100)
            return jnp.sum(pooled)
        return jnp.sum(jax.vmap(one)(
            {k: v for k, v in pyr0.items()},
            seg0 + (g[0, 0, 0, 0] * 1e-12).astype(jnp.int32)))

    results["pyramid_pool_ms"] = measure_ms(
        jax.jit(pool_only), _no_params, gen_img, iters=20)

    def adj_centers(g):
        def one(seg_i):
            e, ev = segment_ops.adjacency_list(seg_i, 100, max_edges=1024)
            c, cv = segment_ops.segment_centers(seg_i, 100)
            return jnp.sum(e) + jnp.sum(c)
        return jnp.sum(jax.vmap(one)(
            seg0 + (g[0, 0, 0, 0] * 1e-12).astype(jnp.int32)))

    results["adj_centers_ms"] = measure_ms(
        jax.jit(adj_centers), _no_params, gen_img, iters=20)

    # ---- derived ----
    results["derived"] = {
        "full_img_per_sec": round(B / results["full_ms"] * 1e3, 1),
        "backbone_share": round(results["backbone_ms"] / results["full_ms"], 3),
        "slic_share": round(results["slic_ms"] / results["full_ms"], 3),
        "inprogram_tail_ms": round(
            results["full_ms"] - results["backbone_ms"] - results["slic_ms"], 2),
    }

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

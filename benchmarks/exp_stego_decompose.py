"""Stego-mode floor decomposition (VERDICT r3 #8).

The stego production mode (ViT-B/8 @448 -> STEGO code head -> per-image
cosine k-means -> pooling/adjacency -> per-pixel MLP) measured 61.4
img/s at B=4 — the slowest production mode — with no breakdown. This
splits the fused program into its stages, each measured with the
chained value-fenced protocol (bench.py method notes), and compares
against the architectural floors:

  * matmul floor: ViT-B/8 at S=3137 is 12 x (12*D^2*S + 4*S^2*D)
    = 629 GFLOP/img of matmul+attention; at the ~97 TFLOP/s the chip
    sustains on these shapes (benchmarks/exp_matmul_shapes.py) that is
    ~6.5 ms/img.
  * softmax-exp floor: B*H*S^2 exps per layer = 12 heads x 3137^2 x 12
    layers = 1.42e9 exps/img; at the ~1.1e11 exp/s VPU transcendental
    rate pinned by the dino analysis (README "Why not more?") that is
    ~12.9 ms/img — the exp alone caps the mode at ~77 img/s.

Also sweeps the flash kernel's block shape at S=3137 (the default
1152x1152 pads 3137 -> 3456, +10%) to check whether the tiling choice
leaves anything on the table.

Run: timeout 1800 python benchmarks/exp_stego_decompose.py
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
EXPS_PER_SEC = 1.1e11  # VPU transcendental rate (README dino floor note)
MATMUL_TFLOPS = 97.0   # sustained on ViT shapes (exp_matmul_shapes.py)


def measure_ms(fn, params_fn, gen, iters, rounds=None):
    """Median ms/call, chained + value-fenced (relay-safe). Model
    params flow through params_fn as jit ARGUMENTS — closing over them
    bakes ~344 MB of ViT-B literals into the serialized HLO and blows
    the remote compiler's request-size limit (HTTP 413)."""
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


def main():
    global SIZE, B, ROUNDS
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=SIZE)
    ap.add_argument("--batch", type=int, default=B)
    ap.add_argument("--rounds", type=int, default=ROUNDS)
    ap.add_argument("--no-sweep", action="store_true", help="skip the flash block sweep")
    cli = ap.parse_args()
    SIZE, B, ROUNDS = cli.size, cli.batch, cli.rounds

    import jax
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.feature_extractor.stego import StegoInterface
    from wild_visual_navigation_tpu.models import get_model
    from wild_visual_navigation_tpu.models.stego_head import cosine_kmeans
    from wild_visual_navigation_tpu.ops import segment_ops
    from wild_visual_navigation_tpu.ops.pixelwise import pixelwise_score
    from wild_visual_navigation_tpu.ops.resize import imagenet_normalize, resize_image
    from wild_visual_navigation_tpu.runtime.fused import build_fused_stego_frame_fn
    from wild_visual_navigation_tpu.utils.confidence_generator import (
        ConfidenceConfig,
        confidence_init,
    )

    key = jax.random.PRNGKey(0)
    cg_cfg, cg_state = ConfidenceConfig(), confidence_init()
    stego = StegoInterface(input_size=SIZE, attention_impl="auto")
    D = 768
    hp = SIZE // 8
    S_seq = hp * hp + 1
    mlp = get_model({
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": 90, "hidden_sizes": [64, 32, 1],
                           "reconstruction": True, "dtype": jnp.bfloat16},
    })
    mp = mlp.init(jax.random.PRNGKey(1), jnp.zeros((1, 90)))

    gen_img = jax.jit(lambda: jax.random.uniform(key, (B, 3, SIZE, SIZE)))

    class _Progress(dict):
        """Print each stage as it lands — partial runs still yield data."""

        def __setitem__(self, k, v):
            super().__setitem__(k, v)
            print(f"[stage] {k} = {v}", flush=True)

    results = _Progress({"config": f"stego_vitb8_{SIZE}px_B{B}_S{S_seq}"})

    # ---- 1. full fused program (the bench_feature_modes number) ----
    fused = build_fused_stego_frame_fn(stego, mlp, cg_cfg, SIZE, jit_compile=False)
    bp, hpar = stego.backbone_params, stego.head_params

    def fence_all(res):
        # every FrameResult field: a trav-only fence lets XLA dead-code-
        # eliminate k-means/segments/confidence (stage "full_trav_only")
        vals = (res.traversability, res.confidence, res.features,
                res.feat_valid, res.segments, res.edges, res.edge_valid,
                res.centers)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in vals)

    full = jax.jit(lambda bp_, hp_, mp_, cg_, img: fence_all(
        fused.frames_batch((bp_, hp_), mp_, cg_, img)))
    results["full_ms"] = measure_ms(
        full, lambda: (bp, hpar, mp, cg_state), gen_img, iters=6)

    # the r3 bench's fence, kept to pin how much work DCE removed
    full_trav = jax.jit(lambda bp_, hp_, mp_, cg_, img: fused.frames_batch(
        (bp_, hp_), mp_, cg_, img).traversability[:, 0, 0])
    results["full_trav_only_ms"] = measure_ms(
        full_trav, lambda: (bp, hpar, mp, cg_state), gen_img, iters=6)

    # ---- 2. backbone only (resize + normalize + ViT-B/8) ----
    vit = stego.vit

    def backbone(bp_, img):
        x = imagenet_normalize(resize_image(img, SIZE, SIZE))
        return jnp.sum(vit.apply(bp_, x)["patch_tokens"], axis=(1, 2))

    results["backbone_ms"] = measure_ms(
        jax.jit(backbone), lambda: (bp,), gen_img, iters=6)

    # ---- 3. backbone + STEGO code head (delta = head cost) ----
    def bb_head(bp_, hp_, img):
        x = imagenet_normalize(resize_image(img, SIZE, SIZE))
        tok = vit.apply(bp_, x)["patch_tokens"]
        return jnp.sum(stego.head.apply(hp_, tok)["code"], axis=(1, 2))

    results["backbone_head_ms"] = measure_ms(
        jax.jit(bb_head), lambda: (bp, hpar), gen_img, iters=6)

    # ---- 4. per-image k-means on fixed codes ----
    codes = jax.random.normal(jax.random.PRNGKey(2), (B, hp * hp, 90))

    def kmeans(c):
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        lab = jax.vmap(lambda ci, k: cosine_kmeans(ci, k, n_clusters=20)[0])(c, keys)
        return jnp.sum(lab)

    results["kmeans_ms"] = measure_ms(jax.jit(kmeans), _no_params, lambda: codes, iters=20)

    # ---- 5. segment pooling + adjacency + centers on a fixed seg ----
    seg_p = jax.random.randint(jax.random.PRNGKey(3), (hp, hp), 0, 20)

    def segops(c):
        """The r3 tail: adjacency + centroids on the 448x448 upsampled map."""
        def one(ci):
            chw = ci.reshape(hp, hp, 90).transpose(2, 0, 1)
            pooled, counts = segment_ops.segment_mean_pool(chw, seg_p, 20)
            iy = (jnp.arange(SIZE) * hp) // SIZE
            seg = seg_p[iy, :][:, iy]
            edges, ev = segment_ops.adjacency_list(seg, 20, max_edges=1024)
            centers, cv = segment_ops.segment_centers(seg, 20)
            return jnp.sum(pooled) + jnp.sum(edges) + jnp.sum(centers)

        return jnp.sum(jax.vmap(one)(c))

    results["segment_ops_fullres_ms"] = measure_ms(
        jax.jit(segops), _no_params, lambda: codes, iters=20)

    def segops_blocked(c):
        """The production tail since r4: patch-res adjacency + block-
        weighted centroids (exact; ops/segment_ops.py)."""
        def one(ci):
            chw = ci.reshape(hp, hp, 90).transpose(2, 0, 1)
            pooled, counts = segment_ops.segment_mean_pool(chw, seg_p, 20)
            edges, ev, centers, cv = segment_ops.upsampled_adjacency_and_centers(
                seg_p, 20, SIZE, SIZE, max_edges=1024)
            return jnp.sum(pooled) + jnp.sum(edges) + jnp.sum(centers)

        return jnp.sum(jax.vmap(one)(c))

    results["segment_ops_blocked_ms"] = measure_ms(
        jax.jit(segops_blocked), _no_params, lambda: codes, iters=20)

    # ---- 6. fused per-pixel scoring from the 90-d code grid ----
    def score(mp_, cg_, c):
        chw = c.reshape(B, hp, hp, 90).transpose(0, 3, 1, 2)
        trav, conf = pixelwise_score(mp_, chw, SIZE, SIZE, cg_cfg, cg_, optimized=True)
        return jnp.sum(trav) + jnp.sum(conf)

    results["pixelwise_score_ms"] = measure_ms(
        jax.jit(score), lambda: (mp, cg_state), lambda: codes, iters=20)

    # ---- 7. optional CRF refinement (off by default in production) ----
    from wild_visual_navigation_tpu.ops.crf import crf_refine_labels

    img1 = jax.random.uniform(jax.random.PRNGKey(4), (3, SIZE, SIZE))
    seg_full = jax.random.randint(jax.random.PRNGKey(5), (SIZE, SIZE), 0, 20)

    def crf(g):
        return jnp.sum(crf_refine_labels(seg_full, g, 20))

    results["crf_per_image_ms"] = measure_ms(jax.jit(crf), _no_params, lambda: img1, iters=5)

    # ---- floors ----
    flops = 12 * (12 * D * D * S_seq + 4 * S_seq * S_seq * D)
    exps = 12 * 12 * S_seq * S_seq  # layers x heads x S^2
    results["floors"] = {
        "matmul_gflop_per_img": round(flops / 1e9, 1),
        "matmul_floor_ms_per_img": round(flops / (MATMUL_TFLOPS * 1e12) * 1e3, 2),
        "softmax_exps_per_img_e9": round(exps / 1e9, 2),
        "exp_floor_ms_per_img": round(exps / EXPS_PER_SEC * 1e3, 2),
    }
    results["derived"] = {
        "full_img_per_sec": round(B / results["full_ms"] * 1e3, 1),
        "backbone_share": round(results["backbone_ms"] / results["full_ms"], 3),
        "head_ms": round(results["backbone_head_ms"] - results["backbone_ms"], 2),
        "tail_ms": round(results["full_ms"] - results["backbone_head_ms"], 2),
        "floor_ms_per_img_total": round(
            results["floors"]["matmul_floor_ms_per_img"]
            + results["floors"]["exp_floor_ms_per_img"], 2),
        "floor_img_per_sec": round(1e3 / (
            results["floors"]["matmul_floor_ms_per_img"]
            + results["floors"]["exp_floor_ms_per_img"]), 1),
    }

    if cli.no_sweep:
        print(json.dumps(results, indent=1))
        return

    # ---- flash block sweep at S=3137 ----
    from wild_visual_navigation_tpu.models.vit import make_vit

    sweep = {}
    for blk in (576, 768, 1152, 1536):
        v = make_vit("dino", "vit_base", 8,
                     attention_impl=f"flash:{blk}:{blk}", dtype=jnp.bfloat16)

        def bb(bp_, img, v=v):
            x = imagenet_normalize(resize_image(img, SIZE, SIZE))
            return jnp.sum(v.apply(bp_, x)["patch_tokens"], axis=(1, 2))

        sweep[f"flash_{blk}"] = measure_ms(
            jax.jit(bb), lambda: (bp,), gen_img, iters=6)
    v = make_vit("dino", "vit_base", 8, attention_impl="xla", dtype=jnp.bfloat16)

    def bb_xla(bp_, img):
        x = imagenet_normalize(resize_image(img, SIZE, SIZE))
        return jnp.sum(v.apply(bp_, x)["patch_tokens"], axis=(1, 2))

    sweep["xla"] = measure_ms(jax.jit(bb_xla), lambda: (bp,), gen_img, iters=6)
    results["backbone_block_sweep_ms"] = sweep

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

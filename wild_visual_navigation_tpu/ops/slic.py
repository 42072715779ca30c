"""SLIC superpixels as a jittable on-device k-means.

TPU-native replacement for the CPU `fast_slic` dependency
(/root/reference/wild_visual_navigation/feature_extractor/feature_extractor.py:85-90,
221-225), which forces a GPU->CPU->GPU round-trip per frame in the
reference. Here segmentation runs on-device inside the fused
extract+infer program.

Algorithm: Lloyd iterations of k-means over (L, a, b, ws*y, ws*x)
pixel features with grid-initialized centers — the SLIC objective with
compactness weighting ws = compactness / S, S = sqrt(H*W/K). Instead
of fast_slic's per-center 2Sx2S search window (a scatter/gather
pattern), each iteration computes the full (HW, K) distance matrix via
one MXU matmul (d2 = |p|^2 - 2 p.c + |c|^2) — at 224^2 x 100 that is
~2 GFLOP/iteration, far cheaper on the MXU than the windowed variant's
irregular memory traffic. Both alternatives were BUILT AND MEASURED in
round 4 and lost: a fast_slic-style 3x3-seed-cell candidate pruning
ran 20x SLOWER on v5e-1 (417 vs 21 ms at B4 @448 — nine (HW, 5)
gathers per iteration; TPU gathers serialize) and broke assignment on
smooth images (centers migrate past the seed window), and a fused
Pallas assign+accumulate kernel lost 25.7 vs 20.6 ms (ops/slic_fused.py
— the op is VPU-bound on the element work, not HBM-bound). The dense
MXU formulation stands. Connectivity enforcement (fast_slic's CCA
post-pass) is intentionally omitted: downstream consumers only
mean-pool per segment, so tiny disconnected islands are harmless.

Output ids are stable grid positions (segment k starts at grid cell k),
unlike fast_slic's arbitrary labels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB in [0,1], shape (3, H, W) -> CIELAB (3, H, W)."""
    r, g, b = rgb[0], rgb[1], rgb[2]

    def inv_gamma(c):
        return jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)

    r, g, b = inv_gamma(r), inv_gamma(g), inv_gamma(b)
    # sRGB D65
    x = 0.4124564 * r + 0.3575761 * g + 0.1804375 * b
    y = 0.2126729 * r + 0.7151522 * g + 0.0721750 * b
    z = 0.0193339 * r + 0.1191920 * g + 0.9503041 * b
    xn, yn, zn = 0.95047, 1.0, 1.08883

    def f(t):
        return jnp.where(t > (6 / 29) ** 3, jnp.cbrt(t), t / (3 * (6 / 29) ** 2) + 4 / 29)

    fx, fy, fz = f(x / xn), f(y / yn), f(z / zn)
    L = 116 * fy - 16
    a = 500 * (fx - fy)
    bb = 200 * (fy - fz)
    return jnp.stack([L, a, bb])


def _grid_centers(num_components: int, height: int, width: int):
    """Initial center pixel coordinates on a regular grid (static)."""
    import math

    ky = max(1, round(math.sqrt(num_components * height / width)))
    kx = max(1, math.ceil(num_components / ky))
    ys = (jnp.arange(ky) + 0.5) * (height / ky)
    xs = (jnp.arange(kx) + 0.5) * (width / kx)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    coords = jnp.stack([yy.ravel(), xx.ravel()], axis=-1)[:num_components]
    # If ky*kx < K (rare), pad by repeating the last cell.
    if coords.shape[0] < num_components:
        pad = jnp.tile(coords[-1:], (num_components - coords.shape[0], 1))
        coords = jnp.concatenate([coords, pad], axis=0)
    return coords  # (K, 2) in (y, x)


@partial(jax.jit, static_argnames=("num_components", "compactness", "iterations"))
def slic(
    img: jnp.ndarray,
    num_components: int = 100,
    compactness: float = 10.0,
    iterations: int = 10,
) -> jnp.ndarray:
    """img: (3, H, W) RGB in [0,1] -> (H, W) int32 segment ids in
    [0, num_components). Batch with vmap."""
    _, H, W = img.shape
    K = num_components
    S = (H * W / K) ** 0.5
    ws = compactness / S

    lab = rgb_to_lab(img)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    feats = jnp.stack(
        [lab[0].ravel(), lab[1].ravel(), lab[2].ravel(), (ys * ws).ravel(), (xs * ws).ravel()],
        axis=-1,
    )  # (HW, 5)

    init_yx = _grid_centers(K, H, W)
    init_idx = (init_yx[:, 0].astype(jnp.int32) * W + init_yx[:, 1].astype(jnp.int32)).clip(0, H * W - 1)
    centers0 = feats[init_idx]  # (K, 5)

    p2 = jnp.sum(feats * feats, axis=-1, keepdims=True)  # (HW, 1)
    yx = jnp.stack([ys.ravel(), xs.ravel()], axis=-1)  # (HW, 2) unscaled
    yx2 = jnp.sum(yx * yx, axis=-1, keepdims=True)
    # SLIC's 2S x 2S search window: candidates farther than 2S are
    # excluded, which is what keeps segments compact (without it a
    # center can capture similar-colored pixels anywhere in the image).
    win2 = (2.0 * S) ** 2
    _BIG = 1e30

    def assign(centers):
        c2 = jnp.sum(centers * centers, axis=-1)[None, :]  # (1, K)
        dots = jnp.dot(feats, centers.T, preferred_element_type=jnp.float32)  # (HW, K) MXU
        d2 = p2 - 2.0 * dots + c2
        cyx = centers[:, 3:] / ws  # (K, 2) unscaled center coords
        cyx2 = jnp.sum(cyx * cyx, axis=-1)[None, :]
        sdots = jnp.dot(yx, cyx.T, preferred_element_type=jnp.float32)
        d2_spatial = yx2 - 2.0 * sdots + cyx2
        masked = jnp.where(d2_spatial <= win2, d2, _BIG)
        best = jnp.argmin(masked, axis=-1)  # (HW,)
        # a pixel with no center in its 2S window (extreme aspect
        # ratios can leave whole bands uncovered by _grid_centers'
        # truncation) falls back to its spatially NEAREST center
        # instead of argmin's arbitrary segment 0
        orphan = jnp.min(d2_spatial, axis=-1) > win2
        return jnp.where(orphan, jnp.argmin(d2_spatial, axis=-1), best)

    def body(_, centers):
        ids = assign(centers)
        onehot = jax.nn.one_hot(ids, K, dtype=jnp.float32)  # (HW, K)
        sums = jnp.dot(onehot.T, feats, preferred_element_type=jnp.float32)  # (K, 5)
        counts = jnp.sum(onehot, axis=0)[:, None]
        new_centers = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), centers)
        return new_centers

    centers = jax.lax.fori_loop(0, iterations, body, centers0)
    return assign(centers).reshape(H, W).astype(jnp.int32)


def slic_batch(
    imgs: jnp.ndarray,
    num_components: int = 100,
    compactness: float = 10.0,
    iterations: int = 10,
    impl: str = "auto",
) -> jnp.ndarray:
    """Batched SLIC: (B, 3, H, W) -> (B, H, W) int32 ids.

    impl="pallas" opts into the fused kernel (ops/slic_fused.py — one
    VMEM-resident assign+accumulate pass per iteration instead of ~5
    materialized (HW, K) arrays). Measured on v5e-1 at the production
    shape (B4 @448, K=100, 10 iters) it LOSES to the XLA path, 25.7 vs
    20.6 ms: the op is VPU-compute-bound on the HW x K distance work,
    which fusion cannot reduce, and XLA already fuses the elementwise
    chain into its reductions — so "auto" resolves to "xla" everywhere
    and the kernel stays an opt-in record of the measurement (the same
    verdict pattern as the int8 backbone, models/quant.py). The two
    paths produce identical single-step assignments; over multiple
    iterations per-block vs whole-image fp32 accumulation of the center
    means drifts boundary pixels (92% label agreement at 448^2/10
    iters; tests/test_segment_ops.py)."""
    if impl == "auto":
        impl = "xla"
    if impl in ("pallas", "pallas-interpret"):
        from .slic_fused import slic_batch_fused

        return slic_batch_fused(imgs, num_components, compactness, iterations,
                                interpret=impl == "pallas-interpret")
    return jax.vmap(
        lambda x: slic(x, num_components=num_components,
                       compactness=compactness, iterations=iterations)
    )(imgs)

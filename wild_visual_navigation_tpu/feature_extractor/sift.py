"""Dense SIFT descriptors in pure jnp.

TPU-native replacement for kornia's DenseSIFTDescriptor used by the
reference's "sift" feature option
(/root/reference/wild_visual_navigation/feature_extractor/feature_extractor.py:15,66,277-286).
Per pixel: image gradients -> soft orientation histogram (8 angular
bins) -> 4x4 spatial grid of average-pooled bins -> 128-d descriptor,
L2-normalized with the standard 0.2 clipping. The reference applies the
descriptor per RGB channel and concatenates (3 x 128 = 384 dims,
feature_extractor.py:277-286); `dense_sift_features` reproduces that.

Everything is conv/pool shaped — XLA maps it onto the MXU/VPU; no
python loops over pixels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_NUM_ANG_BINS = 8
_NUM_SPATIAL_BINS = 4
_BIN_SIZE = 4  # pixels per spatial bin edge


def _gradients(img: jnp.ndarray):
    """Central-difference gradients of (H, W) with replicate padding."""
    p = jnp.pad(img, ((1, 1), (1, 1)), mode="edge")
    gx = (p[1:-1, 2:] - p[1:-1, :-2]) * 0.5
    gy = (p[2:, 1:-1] - p[:-2, 1:-1]) * 0.5
    return gx, gy


def _avg_pool_same(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Mean filter with window k, same (edge) padding, on (C, H, W)."""
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, k - 1 - pad), (pad, k - 1 - pad)), mode="edge")
    summed = jax.lax.reduce_window(
        xp, 0.0, jax.lax.add, window_dimensions=(1, k, k), window_strides=(1, 1, 1), padding="VALID"
    )
    return summed / (k * k)


@partial(jax.jit)
def dense_sift_channel(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) single channel -> (128, H, W) dense SIFT descriptors."""
    H, W = img.shape
    gx, gy = _gradients(img)
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
    ori = jnp.arctan2(gy, gx)  # [-pi, pi]

    # Soft assignment to angular bins (linear interpolation between the
    # two nearest bin centers).
    o = (ori + jnp.pi) / (2 * jnp.pi) * _NUM_ANG_BINS  # [0, 8]
    b0 = jnp.floor(o - 0.5)
    w1 = o - 0.5 - b0
    b0 = jnp.mod(b0, _NUM_ANG_BINS).astype(jnp.int32)
    b1 = jnp.mod(b0 + 1, _NUM_ANG_BINS)
    bins = jnp.arange(_NUM_ANG_BINS)[:, None, None]
    hist = (bins == b0[None]) * (mag * (1 - w1))[None] + (bins == b1[None]) * (mag * w1)[None]  # (8, H, W)

    # Average-pool each angular channel over one spatial bin.
    pooled = _avg_pool_same(hist, _BIN_SIZE)  # (8, H, W)

    # Gather the 4x4 grid of spatial bins around each pixel by shifting
    # (static python offsets — this unrolls into 16 rolls under jit).
    offsets = [int(round((i - (_NUM_SPATIAL_BINS - 1) / 2.0) * _BIN_SIZE)) for i in range(_NUM_SPATIAL_BINS)]
    descs = []
    for sy in offsets:
        for sx in offsets:
            shifted = jnp.roll(pooled, shift=(-sy, -sx), axis=(1, 2))
            descs.append(shifted)
    desc = jnp.concatenate(descs, axis=0)  # (128, H, W)

    # SIFT normalization: L2 -> clip 0.2 -> L2.
    norm = jnp.sqrt(jnp.sum(desc * desc, axis=0, keepdims=True) + 1e-12)
    desc = jnp.minimum(desc / norm, 0.2)
    norm2 = jnp.sqrt(jnp.sum(desc * desc, axis=0, keepdims=True) + 1e-12)
    return desc / norm2


def dense_sift_features(img: jnp.ndarray) -> jnp.ndarray:
    """(3, H, W) RGB -> (384, H, W): per-channel dense SIFT concatenated,
    matching the reference compute_sift (feature_extractor.py:277-286).
    A single-channel input yields (128, H, W)."""
    if img.shape[0] == 3:
        return jnp.concatenate([dense_sift_channel(img[c]) for c in range(3)], axis=0)
    return dense_sift_channel(img[0])

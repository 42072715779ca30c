"""Dense color-histogram features.

The reference declares a `histogram` feature type with feature_dim 90
but leaves it unimplemented (feature_extractor.py:66,273-274 raises
NotImplementedError). This provides the capability TPU-natively: each
pixel is encoded as a SOFT one-hot over a 10 (hue) x 3 (saturation) x 3
(value) = 90-bin HSV grid, so the framework's standard per-segment mean
pooling (segment_ops.segment_mean_pool) of this dense field IS the
segment's normalized color histogram — no special-cased pooling path.
Hue is binned with a circular triangular kernel (red near 0 and near 1
lands in the same bins); saturation/value use hard bins. Everything is
jittable, fixed-shape, and fits the dense-feature contract
(D, H, W) the rest of the pipeline consumes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIST_BINS = (10, 3, 3)  # hue, saturation, value -> 90 dims
HIST_DIM = HIST_BINS[0] * HIST_BINS[1] * HIST_BINS[2]


def rgb_to_hsv(img: jnp.ndarray) -> jnp.ndarray:
    """(3, H, W) RGB in [0, 1] -> (3, H, W) HSV, hue in [0, 1)."""
    r, g, b = img[0], img[1], img[2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    hr = ((g - b) / safe) % 6.0
    hg = (b - r) / safe + 2.0
    hb = (r - g) / safe + 4.0
    h = jnp.where(maxc == r, hr, jnp.where(maxc == g, hg, hb)) / 6.0
    h = jnp.where(delta > 0, h % 1.0, 0.0)
    return jnp.stack([h, s, v])


def dense_color_histogram(img: jnp.ndarray) -> jnp.ndarray:
    """(3, H, W) RGB in [0, 1] -> (90, H, W) soft HSV-bin encoding.

    Per pixel the 90 channels sum to 1; a mean over any pixel set is
    that set's normalized color histogram.
    """
    nh, ns, nv = HIST_BINS
    h, s, v = rgb_to_hsv(img)

    # circular triangular soft-binning over hue
    centers = (jnp.arange(nh) + 0.5) / nh  # (nh,)
    d = jnp.abs(h[None] - centers[:, None, None])  # (nh, H, W)
    d = jnp.minimum(d, 1.0 - d)  # circular distance
    hue_w = jnp.clip(1.0 - d * nh, 0.0, 1.0)  # triangular kernel, width 2/nh
    hue_w = hue_w / jnp.maximum(jnp.sum(hue_w, axis=0, keepdims=True), 1e-12)

    def hard_onehot(x, n):
        idx = jnp.clip((x * n).astype(jnp.int32), 0, n - 1)
        return jax.nn.one_hot(idx, n, dtype=img.dtype, axis=0)  # (n, H, W)

    sat_w = hard_onehot(s, ns)
    val_w = hard_onehot(v, nv)
    out = hue_w[:, None, None] * sat_w[None, :, None] * val_w[None, None, :]  # (nh, ns, nv, H, W)
    return out.reshape(HIST_DIM, *img.shape[1:])

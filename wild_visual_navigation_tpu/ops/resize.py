"""Image resize / crop / feature-interpolation primitives in pure jnp.

Replaces the reference's torchvision transforms and F.interpolate calls:
  * `T.Resize(size, NEAREST) + T.CenterCrop(size)` — the image path of
    ImageProjector.resize_image (image_projector.py:57) and
    DinoInterface's transform (dino_interface.py:52-59).
  * `F.interpolate(..., mode="bilinear", align_corners=True)` — the
    dense-feature upsample (dino_interface.py:90).

All functions take NCHW float arrays and static output sizes, so they
fuse into the surrounding jitted programs (no host round-trips).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _nearest_indices(out_size: int, in_size: int) -> jnp.ndarray:
    # torch's F.interpolate(mode="nearest") mapping: floor(i * in / out)
    idx = jnp.floor(jnp.arange(out_size) * (in_size / out_size)).astype(jnp.int32)
    return jnp.clip(idx, 0, in_size - 1)


@partial(jax.jit, static_argnames=("new_h", "new_w"))
def resize_nearest(img: jnp.ndarray, new_h: int, new_w: int) -> jnp.ndarray:
    """Nearest-neighbor resize of (..., H, W) to (..., new_h, new_w)."""
    h, w = img.shape[-2], img.shape[-1]
    iy = _nearest_indices(new_h, h)
    ix = _nearest_indices(new_w, w)
    return img[..., iy, :][..., ix]


def resize_smaller_edge_nearest(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """torchvision `Resize(size)` semantics: scale the smaller edge to
    `size`, keeping aspect ratio (nearest interpolation). The long edge
    TRUNCATES like torchvision's `int(size * long / short)` — round()
    diverges by one column at e.g. 1080x1440 @224 (298.67 -> 299 vs
    torchvision's 298), shifting the center-crop window."""
    h, w = img.shape[-2], img.shape[-1]
    if h <= w:
        new_h, new_w = size, max(1, int(size * w / h))
    else:
        new_h, new_w = max(1, int(size * h / w)), size
    return resize_nearest(img, new_h, new_w)


def center_crop(img: jnp.ndarray, crop_h: int, crop_w: int | None = None) -> jnp.ndarray:
    """torchvision `CenterCrop` on (..., H, W); pads with zeros when the
    crop is larger than the input (matching torchvision)."""
    if crop_w is None:
        crop_w = crop_h
    h, w = img.shape[-2], img.shape[-1]
    pad_h, pad_w = max(0, crop_h - h), max(0, crop_w - w)
    if pad_h or pad_w:
        cfg = [(0, 0)] * (img.ndim - 2) + [
            (pad_h // 2, pad_h - pad_h // 2),
            (pad_w // 2, pad_w - pad_w // 2),
        ]
        img = jnp.pad(img, cfg)
        h, w = img.shape[-2], img.shape[-1]
    top = (h - crop_h) // 2
    left = (w - crop_w) // 2
    return img[..., top : top + crop_h, left : left + crop_w]


def resize_image(img: jnp.ndarray, new_h: int, new_w: int | None = None) -> jnp.ndarray:
    """ImageProjector.resize_image semantics (image_projector.py:55-59):
    square target -> aspect-preserving resize + center crop; otherwise a
    direct (new_h, new_w) nearest resize."""
    if new_w is None or new_w == new_h:
        return center_crop(resize_smaller_edge_nearest(img, new_h), new_h)
    return resize_nearest(img, new_h, new_w)


@partial(jax.jit, static_argnames=("new_h", "new_w"))
def interpolate_bilinear(x: jnp.ndarray, new_h: int, new_w: int) -> jnp.ndarray:
    """Bilinear resize with align_corners=True on (..., H, W).

    Matches `F.interpolate(features, size, mode="bilinear",
    align_corners=True)` at dino_interface.py:90 — required for
    numerical parity of the dense-feature upsample.
    """
    h, w = x.shape[-2], x.shape[-1]

    def coords(out, inp):
        if out == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(out, dtype=jnp.float32) * ((inp - 1) / (out - 1))

    fy, fx = coords(new_h, h), coords(new_w, w)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (fy - y0.astype(jnp.float32))[:, None]
    wx = (fx - x0.astype(jnp.float32))[None, :]

    a = x[..., y0, :][..., x0]
    b = x[..., y0, :][..., x1]
    c = x[..., y1, :][..., x0]
    d = x[..., y1, :][..., x1]
    top = a * (1 - wx) + b * wx
    bot = c * (1 - wx) + d * wx
    return top * (1 - wy) + bot * wy


def _bilinear_matrix_np(out_size: int, in_size: int):
    """Pure-numpy form of `_bilinear_matrix` — safe to index/convert on
    the host during a jit trace (jnp constants become tracers there)."""
    import numpy as np

    M = np.zeros((out_size, in_size), np.float32)
    if out_size == 1:
        M[0, 0] = 1.0
        return M
    f = np.arange(out_size, dtype=np.float64) * ((in_size - 1) / (out_size - 1))
    i0 = np.clip(np.floor(f).astype(int), 0, in_size - 1)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    w = (f - i0).astype(np.float32)
    rows = np.arange(out_size)
    M[rows, i0] += 1.0 - w
    M[rows, i1] += w
    return M


def _bilinear_matrix(out_size: int, in_size: int) -> jnp.ndarray:
    """(out, in) align_corners=True two-tap interpolation matrix —
    each row holds the bilinear lerp weights of interpolate_bilinear
    for one output coordinate."""
    return jnp.asarray(_bilinear_matrix_np(out_size, in_size))


def interpolate_bilinear_mxu(
    x: jnp.ndarray, new_h: int, new_w: int, precision=None
) -> jnp.ndarray:
    """interpolate_bilinear reformulated as two constant-matrix matmuls
    (separable two-tap interpolation), so the big feature upsample of
    the per-pixel scoring path runs on the MXU instead of as four
    pixel gathers + VPU lerps — the gathers materialize 4x the output
    in HBM, which dominated the pixelwise benchmark. Same math (each
    output is the same two-tap lerp per axis; only fp summation order
    differs — equivalence-tested to ~1e-6 in tests/test_models.py).

    `precision` is forwarded to the einsums — the Gram scoring path
    passes HIGHEST because its fp32 upsamples feed cancelling sums
    (TPU fp32 matmuls otherwise multiply in bf16)."""
    h, w = x.shape[-2], x.shape[-1]
    Mh = _bilinear_matrix(new_h, h).astype(x.dtype)
    Mw = _bilinear_matrix(new_w, w).astype(x.dtype)
    out = jnp.einsum("oh,...hw->...ow", Mh, x, precision=precision)
    return jnp.einsum("pw,...ow->...op", Mw, out, precision=precision)


def interpolate_bilinear_mxu_nhwc(
    x: jnp.ndarray, new_h: int, new_w: int, precision=None
) -> jnp.ndarray:
    """interpolate_bilinear_mxu for channels-LAST input (B, h, w, C) ->
    (B, new_h, new_w, C). Same two-tap math; the channels-last layout
    lets the per-pixel scorer reshape straight to (N, C) rows with no
    transpose — at 448² the NCHW->rows transpose moves ~100 MB/frame."""
    h, w = x.shape[-3], x.shape[-2]
    Mh = _bilinear_matrix(new_h, h).astype(x.dtype)
    Mw = _bilinear_matrix(new_w, w).astype(x.dtype)
    out = jnp.einsum("oh,bhwc->bowc", Mh, x, precision=precision)
    return jnp.einsum("pw,bowc->bopc", Mw, out, precision=precision)


def interpolate_bilinear_mxu_precise(x: jnp.ndarray, new_h: int, new_w: int) -> jnp.ndarray:
    """fp32 HIGHEST-precision form of interpolate_bilinear_mxu for the
    cancellation-sensitive terms of the Gram per-pixel scorer."""
    return interpolate_bilinear_mxu(
        x.astype(jnp.float32), new_h, new_w, precision=jax.lax.Precision.HIGHEST
    )


def _bilinear_pair_matrices(out_size: int, in_size: int):
    """Pair-product forms of `_bilinear_matrix` for interpolating
    SQUARED-norm maps: Mq = M ⊙ M (out, in) and the adjacent-tap cross
    products Mx[o, i] = M[o, i] * M[o, i+1] (out, in-1).

    They come from expanding ||Σ_i M[o,i] f_i||² = Σ_{i,i'} M[o,i]
    M[o,i'] <f_i, f_i'> — with two-tap rows only the diagonal (Mq) and
    adjacent (Mx, counted twice by symmetry) pairs survive. Boundary
    rows where both taps merge onto the last index collapse to a single
    weight-1 entry in Mq and a zero row in Mx, which is exactly right.
    """
    Mq, Mx = _bilinear_pair_matrices_np(out_size, in_size)
    return jnp.asarray(Mq), jnp.asarray(Mx)


def _bilinear_pair_matrices_np(out_size: int, in_size: int):
    """Pure-numpy core of `_bilinear_pair_matrices` — the single audited
    place the squared-norm pair-product expansion lives (also consumed
    host-side by ops/pixelwise_fused.py, where jnp constants would
    become tracers mid-trace)."""
    import numpy as np

    M = _bilinear_matrix_np(out_size, in_size)
    Mq = M * M
    Mx = M[:, :-1] * M[:, 1:] if in_size > 1 else np.zeros((out_size, 0), M.dtype)
    return Mq, Mx


def interpolate_norm_sq_mxu(x: jnp.ndarray, new_h: int, new_w: int) -> jnp.ndarray:
    """Σ_d interpolate_bilinear(x)² over the channel axis WITHOUT
    materializing the upsampled map: x (B, D, H, W) -> (B, new_h, new_w).

    The per-pixel squared norm of a separable two-tap interpolation is a
    weighted sum of Gram products between the four neighbouring input
    cells; the five patch-resolution Gram maps (self, right, down, and
    the two diagonals) are D-contractions at INPUT resolution, and the
    pixel-resolution combination uses the pair-product matrices above —
    so the D-channel pixel-resolution tensor (the dominant HBM cost of
    the per-pixel scoring path) never exists. All in fp32; the small
    constant-matrix contractions run at HIGHEST precision because the
    caller subtracts this from same-magnitude terms (cancellation)."""
    xf = x.astype(jnp.float32)
    g00 = jnp.einsum("bdhw,bdhw->bhw", xf, xf)
    g01 = jnp.einsum("bdhw,bdhw->bhw", xf[..., :-1], xf[..., 1:])
    g10 = jnp.einsum("bdhw,bdhw->bhw", xf[:, :, :-1], xf[:, :, 1:])
    g11 = jnp.einsum("bdhw,bdhw->bhw", xf[:, :, :-1, :-1], xf[:, :, 1:, 1:])
    g1m1 = jnp.einsum("bdhw,bdhw->bhw", xf[:, :, 1:, :-1], xf[:, :, :-1, 1:])
    h, w = x.shape[-2], x.shape[-1]
    Aq, Ax = _bilinear_pair_matrices(new_h, h)
    Bq, Bx = _bilinear_pair_matrices(new_w, w)

    def sep(m, Mh_, Mw_):
        t = jnp.einsum("oh,bhw->bow", Mh_, m, precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("pw,bow->bop", Mw_, t, precision=jax.lax.Precision.HIGHEST)

    out = sep(g00, Aq, Bq)
    if w > 1:
        out = out + 2.0 * sep(g01, Aq, Bx)
    if h > 1:
        out = out + 2.0 * sep(g10, Ax, Bq)
    if h > 1 and w > 1:
        out = out + 2.0 * sep(g11 + g1m1, Ax, Bx)
    return out


IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def imagenet_normalize(img: jnp.ndarray) -> jnp.ndarray:
    """Channel-wise ImageNet normalization of (..., 3, H, W) in [0, 1]."""
    mean = IMAGENET_MEAN.reshape((3, 1, 1)).astype(img.dtype)
    std = IMAGENET_STD.reshape((3, 1, 1)).astype(img.dtype)
    return (img - mean) / std

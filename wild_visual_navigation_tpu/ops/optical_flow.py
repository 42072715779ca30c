"""Pyramidal Lucas-Kanade optical flow / KLT point tracking in pure jnp.

The reference's optical-flow capability lives in its deprecated KLT
tracker (.deprecated/utils/klt_tracker.py) and an optional pytorch_pwc
dependency (tests/test_optical_flow.py:11); it is used for mission-node
visualization association (SURVEY.md §2.3). This is a TPU-native
implementation: fixed pyramid levels, fixed iterations, batched point
tracking — everything jittable (lax.fori_loop, static window size).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """(3, H, W) or (H, W) -> (H, W) luma."""
    if img.ndim == 3:
        r, g, b = img[0], img[1], img[2]
        return 0.299 * r + 0.587 * g + 0.114 * b
    return img


def _downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pool (even-size crop)."""
    H, W = img.shape
    H2, W2 = H // 2 * 2, W // 2 * 2
    x = img[:H2, :W2].reshape(H2 // 2, 2, W2 // 2, 2)
    return x.mean(axis=(1, 3))


def _bilinear_sample(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W) at float coords; clamped borders."""
    H, W = img.shape
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)
    a = img[y0, x0]
    b = img[y0, x1]
    c = img[y1, x0]
    d = img[y1, x1]
    return (a * (1 - wx) + b * wx) * (1 - wy) + (c * (1 - wx) + d * wx) * wy


def _lk_level(prev: jnp.ndarray, nxt: jnp.ndarray, pts: jnp.ndarray, flow: jnp.ndarray,
              window: int, iters: int):
    """One pyramid level of iterative LK for (N, 2) points (x, y)."""
    half = (window - 1) / 2.0
    dy = jnp.arange(window, dtype=jnp.float32) - half
    oy, ox = jnp.meshgrid(dy, dy, indexing="ij")  # (w, w)

    # central differences with REPLICATED borders (OpenCV's
    # BORDER_REFLECT_101-family behavior for calcOpticalFlowPyrLK);
    # jnp.roll would wrap the opposite image edge into the structure
    # tensor for points within window/2 of a border
    pad_x = jnp.pad(prev, ((0, 0), (1, 1)), mode="edge")
    pad_y = jnp.pad(prev, ((1, 1), (0, 0)), mode="edge")
    gx_img = (pad_x[:, 2:] - pad_x[:, :-2]) * 0.5
    gy_img = (pad_y[2:, :] - pad_y[:-2, :]) * 0.5

    def track_one(pt, f0):
        px, py = pt[0], pt[1]
        ys = py + oy
        xs = px + ox
        T = _bilinear_sample(prev, ys, xs)  # template
        gx = _bilinear_sample(gx_img, ys, xs)
        gy = _bilinear_sample(gy_img, ys, xs)
        # structure tensor (2x2), constant per point
        Gxx = jnp.sum(gx * gx)
        Gxy = jnp.sum(gx * gy)
        Gyy = jnp.sum(gy * gy)
        det = Gxx * Gyy - Gxy * Gxy
        det_safe = jnp.where(jnp.abs(det) < 1e-8, 1.0, det)
        good = jnp.abs(det) >= 1e-8

        def body(_, f):
            I = _bilinear_sample(nxt, ys + f[1], xs + f[0])
            diff = I - T
            bx = jnp.sum(diff * gx)
            by = jnp.sum(diff * gy)
            du = -(Gyy * bx - Gxy * by) / det_safe
            dv = -(-Gxy * bx + Gxx * by) / det_safe
            return f + jnp.where(good, jnp.asarray([du, dv]), 0.0)

        f = jax.lax.fori_loop(0, iters, body, f0)
        return f, good

    return jax.vmap(track_one)(pts, flow)


@partial(jax.jit, static_argnames=("levels", "window", "iters"))
def track_points(
    prev_img: jnp.ndarray,
    next_img: jnp.ndarray,
    points: jnp.ndarray,
    levels: int = 3,
    window: int = 15,
    iters: int = 10,
):
    """Track (N, 2) (x, y) points from prev to next image.

    Returns (new_points (N, 2), valid (N,) bool). Validity = invertible
    structure tensor at the finest level and the point staying in
    bounds (OpenCV calcOpticalFlowPyrLK contract, which the reference's
    KLT tracker mirrors)."""
    prev = _to_gray(jnp.asarray(prev_img, jnp.float32))
    nxt = _to_gray(jnp.asarray(next_img, jnp.float32))

    pyr_prev = [prev]
    pyr_next = [nxt]
    for _ in range(levels - 1):
        pyr_prev.append(_downsample2(pyr_prev[-1]))
        pyr_next.append(_downsample2(pyr_next[-1]))

    N = points.shape[0]
    flow = jnp.zeros((N, 2), jnp.float32)
    good = jnp.ones((N,), bool)
    for lvl in reversed(range(levels)):
        scale = 2.0**lvl
        pts_l = points / scale
        flow, good_l = _lk_level(pyr_prev[lvl], pyr_next[lvl], pts_l, flow / scale, window, iters)
        flow = flow * scale
        good = good & good_l

    new_pts = points + flow
    H, W = prev.shape
    inb = (
        (new_pts[:, 0] >= 0) & (new_pts[:, 0] <= W - 1) & (new_pts[:, 1] >= 0) & (new_pts[:, 1] <= H - 1)
    )
    return new_pts, good & inb


@partial(jax.jit, static_argnames=("stride", "levels", "window", "iters"))
def dense_flow(prev_img: jnp.ndarray, next_img: jnp.ndarray, stride: int = 8,
               levels: int = 3, window: int = 15, iters: int = 10):
    """Dense-ish flow on a stride grid: returns (pts (N,2), flow (N,2),
    valid (N,)) — the visualization-grade field the reference plots
    (visu plot_optical_flow)."""
    img = _to_gray(jnp.asarray(prev_img, jnp.float32))
    H, W = img.shape
    ys = jnp.arange(stride // 2, H, stride, dtype=jnp.float32)
    xs = jnp.arange(stride // 2, W, stride, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    pts = jnp.stack([xx.ravel(), yy.ravel()], axis=-1)
    new_pts, valid = track_points(prev_img, next_img, pts, levels=levels, window=window, iters=iters)
    return pts, new_pts - pts, valid

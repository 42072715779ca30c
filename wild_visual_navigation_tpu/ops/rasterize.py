"""Convex-polygon rasterization on TPU.

TPU-native replacement for `kornia.utils.draw.draw_convex_polygon`
(used at /root/reference/wild_visual_navigation/image_projector/image_projector.py:186)
in the supervision-mask reprojection pipeline. The design differs from
the CUDA rasterizer on purpose:

  1. A fixed-iteration, fully-vectorized gift-wrapping (Jarvis march)
     computes the 2-D convex hull of the (masked) projected footprint
     points — O(H_max * N^2) cross products, all on the VPU, no
     data-dependent shapes.
  2. The hull is rasterized by a half-plane test: a pixel is inside iff
     it is on the inner side of every hull edge. Implemented as a
     `lax.scan` over hull edges accumulating a running minimum of the
     edge functions, so the live memory is O(B*H*W), never O(B*E*H*W).

NaN semantics: instead of the reference's NaN-sentinel masks
(image_projector.py:195), we return boolean inside-masks; callers fuse
them with a +inf "unset" sentinel (see traversability/estimator.py),
which keeps every downstream op XLA-friendly (min/isfinite instead of
fmin/isnan).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .projection import Camera, project_points

_EPS = 1e-6
_BIG = 1e30


def _cross2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def convex_hull(points: jnp.ndarray, valid: jnp.ndarray, max_hull: int = 32):
    """Fixed-size convex hull of masked 2-D points (single instance).

    Args:
        points: (N, 2) float32.
        valid: (N,) bool; invalid points are ignored.
        max_hull: static max number of hull vertices to emit.

    Returns:
        hull: (max_hull, 2) vertices in counter-clockwise order (in a
            y-down image frame this is clockwise on screen); once the
            march returns to the start, the start vertex is repeated —
            degenerate edges are harmless for the half-plane fill.
        hull_valid: (max_hull,) bool.
    """
    n = points.shape[0]
    finite = jnp.all(jnp.isfinite(points), axis=-1)
    valid = valid & finite
    num_valid = jnp.sum(valid)
    # Start at lowest-y (then lowest-x) valid point — an extreme point.
    safe_pts = jnp.where(valid[:, None], points, _BIG)
    key = safe_pts[:, 1] * 1e6 + safe_pts[:, 0]
    start_idx = jnp.argmin(key)
    start = points[start_idx]

    def step(carry, _):
        cur_idx, cur, done = carry
        d = points - cur  # (N, 2)
        dist = jnp.linalg.norm(d, axis=-1)
        cand = valid & (dist > _EPS)
        # C[j, k] = cross(d_j, d_k): j is the next hull vertex iff no
        # valid candidate k lies clockwise of ray cur->j.
        C = _cross2(d[:, None, :], d[None, :, :])  # (N, N)
        consider = cand[None, :]
        min_cross = jnp.min(jnp.where(consider, C, _BIG), axis=1)  # (N,)
        is_hull_dir = cand & (min_cross >= -_EPS * (1.0 + dist * dist))
        # Tie-break collinear candidates by taking the farthest.
        score = jnp.where(is_hull_dir, dist, -1.0)
        nxt_idx = jnp.argmax(score)
        any_cand = jnp.any(is_hull_dir)
        nxt_idx = jnp.where(any_cand, nxt_idx, cur_idx)
        nxt = points[nxt_idx]
        closed = (nxt_idx == start_idx) | ~any_cand
        new_done = done | closed
        out_vert = jnp.where(done, start, nxt)
        out_valid = ~done & ~closed  # the closing vertex repeats start
        return (nxt_idx, jnp.where(done, cur, nxt), new_done), (out_vert, out_valid)

    init = (start_idx, start, num_valid < 3)
    (_, _, _), (verts, vvalid) = jax.lax.scan(step, init, None, length=max_hull - 1)
    hull = jnp.concatenate([start[None], verts], axis=0)
    hull_valid = jnp.concatenate([(num_valid >= 3)[None], vvalid], axis=0)
    # Invalid tail vertices collapse onto the start point -> zero-length
    # edges that never constrain the half-plane test.
    hull = jnp.where(hull_valid[:, None], hull, start[None])
    return hull, hull_valid


def fill_convex_hull(hull: jnp.ndarray, hull_valid: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Rasterize one convex hull into a (height, width) bool mask.

    Half-plane test at integer pixel coordinates (x right, y down),
    scanned over hull edges so peak memory stays O(H*W).
    """
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]

    nxt = jnp.roll(hull, -1, axis=0)
    edges = jnp.stack([hull, nxt], axis=1)  # (E, 2, 2)

    def edge_fn(acc, e):
        v0, v1 = e[0], e[1]
        ex, ey = v1[0] - v0[0], v1[1] - v0[1]
        # cross(edge, q - v0) for every pixel q
        val = ex * (ys - v0[1]) - ey * (xs - v0[0])
        # Degenerate (zero-length padding) edges contribute 0 == no-op.
        return jnp.minimum(acc, val), None

    acc0 = jnp.full((height, width), _BIG, dtype=jnp.float32)
    acc, _ = jax.lax.scan(edge_fn, acc0, edges)
    ok = jnp.sum(hull_valid) >= 3
    return (acc >= -_EPS) & ok


@partial(jax.jit, static_argnames=("height", "width", "max_hull", "use_pallas"))
def rasterize_points_hull(
    points2d: jnp.ndarray,
    valid: jnp.ndarray,
    height: int,
    width: int,
    max_hull: int = 32,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Batched: mask of the convex hull of valid projected points.

    points2d: (B, N, 2), valid: (B, N) -> (B, height, width) bool.

    use_pallas selects the Pallas fill kernel (rasterize_pallas.py);
    measured on v5e, XLA fully unrolls and fuses the edge scan into a
    single pass (~20-40 us for B=32 at 224^2, same as the kernel), so
    the simpler scan remains the default and the kernel is kept as a
    verified, exact-matching alternative.
    """
    if use_pallas is None:
        use_pallas = False

    hulls, hvs = jax.vmap(lambda p, v: convex_hull(p, v, max_hull=max_hull))(points2d, valid)
    if use_pallas:
        from .rasterize_pallas import fill_hulls_pallas

        return fill_hulls_pallas(hulls, hvs, height, width)
    return jax.vmap(lambda h, v: fill_convex_hull(h, v, height, width))(hulls, hvs)


def project_and_render(
    camera: Camera,
    pose_camera_in_world: jnp.ndarray,
    points_world: jnp.ndarray,
    max_hull: int = 32,
):
    """Project world points and rasterize their convex hull.

    The TPU equivalent of ImageProjector.project_and_render
    (image_projector.py:152-197): vertices behind the camera are
    dropped (the reference NaN-masks them before kornia draws), and the
    convex hull of the remainder is filled.

    Returns:
        inside: (B, H, W) bool mask.
        points_2d: (B, N, 2) projections.
        valid: (B, N) full validity (cheirality + in-bounds).
    """
    pts2d, valid, valid_z = project_points(camera, pose_camera_in_world, points_world)
    inside = rasterize_points_hull(pts2d, valid_z, camera.height, camera.width, max_hull=max_hull)
    return inside, pts2d, valid

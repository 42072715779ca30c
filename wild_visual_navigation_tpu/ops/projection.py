"""Batched pinhole camera projection in pure jnp.

TPU-native replacement for the reference's kornia `PinholeCamera` usage
in /root/reference/wild_visual_navigation/image_projector/image_projector.py:16-150.
No distortion model. Everything is fixed-shape and jittable; invalid
projections are reported via masks rather than data-dependent filtering.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..utils.lie import se3_inverse, transform_points


class Camera(NamedTuple):
    """Batched pinhole camera intrinsics pytree.

    K: (B, 3, 3) scaled intrinsics; height/width are static ints
    (XLA needs static output shapes for rasterization).
    """

    K: jnp.ndarray
    height: int
    width: int


def scale_intrinsics(
    K: jnp.ndarray,
    h: int,
    w: int,
    new_h: Optional[int] = None,
    new_w: Optional[int] = None,
) -> jnp.ndarray:
    """Rescale camera intrinsics for a resized (and center-cropped) image.

    Mirrors the reference ImageProjector ctor (image_projector.py:44-78)
    including its quirk for the square-crop case: when the output is
    square (new_w is None or equal to new_h), fx/cx are taken from
    fy/cy scaled by sy — i.e. the horizontal center-crop after the
    aspect-preserving resize recenters the principal point.

    K may be (3, 3)/(4, 4) or batched (B, 3, 3)/(B, 4, 4). Returns K
    with the same leading batch shape as (..., 3, 3).
    """
    K = jnp.asarray(K, dtype=jnp.float32)
    if K.shape[-1] == 4:
        K = K[..., :3, :3]
    if new_h is None:
        new_h = h
    sy = new_h / h
    sx = (new_w / w) if new_w is not None else sy

    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    if new_w is None or new_w == new_h:
        nfx, ncx = fy * sy, cy * sy
    else:
        nfx, ncx = fx * sx, cx * sx
    nfy, ncy = fy * sy, cy * sy

    sK = jnp.zeros(K.shape[:-2] + (3, 3), dtype=jnp.float32)
    sK = sK.at[..., 0, 0].set(nfx)
    sK = sK.at[..., 1, 1].set(nfy)
    sK = sK.at[..., 0, 2].set(ncx)
    sK = sK.at[..., 1, 2].set(ncy)
    sK = sK.at[..., 2, 2].set(1.0)
    return sK


def make_camera(K, h: int, w: int, new_h: Optional[int] = None, new_w: Optional[int] = None) -> Camera:
    """Build a scaled Camera, mirroring `ImageProjector.__init__`."""
    sK = scale_intrinsics(K, h, w, new_h=new_h, new_w=new_w)
    out_h = new_h if new_h is not None else h
    out_w = new_w if new_w is not None else out_h
    return Camera(K=sK if sK.ndim == 3 else sK[None], height=int(out_h), width=int(out_w))


def project_points(
    camera: Camera,
    pose_camera_in_world: jnp.ndarray,
    points_world: jnp.ndarray,
):
    """World-frame points -> image plane with validity masks.

    Mirrors ImageProjector.project (image_projector.py:128-150):
      * transforms into the camera frame via the inverse extrinsics,
      * pinhole-projects,
      * validity = in-front-of-camera AND inside [0, W] x [0, H].

    Args:
        camera: Camera with K (B, 3, 3).
        pose_camera_in_world: (B, 4, 4).
        points_world: (B, N, 3).

    Returns:
        points_2d: (B, N, 2) pixel coordinates (x, y).
        valid: (B, N) bool — cheirality and in-bounds.
        valid_z: (B, N) bool — cheirality only (z >= 0), which is what
            the reference uses to mask polygon vertices
            (image_projector.py:182).
    """
    T_CW = se3_inverse(pose_camera_in_world)
    points_c = transform_points(T_CW, points_world)  # (B, N, 3)
    z = points_c[..., 2]
    # Guard the divide; invalid points are masked out downstream.
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    uvw = jnp.einsum("bij,bnj->bni", camera.K, points_c)
    pts2d = uvw[..., :2] / z_safe[..., None]

    valid_z = z >= 0
    valid_x = (pts2d[..., 0] >= 0) & (pts2d[..., 0] <= camera.width)
    valid_y = (pts2d[..., 1] >= 0) & (pts2d[..., 1] <= camera.height)
    return pts2d, valid_z & valid_x & valid_y, valid_z

"""3-D sampling of footprint/collision geometry in pure jnp.

TPU-native replacement of the reference's torch+kornia mesh builders
(/root/reference/wild_visual_navigation/utils/meshes.py:10-165). All
functions return **fixed-shape** point sets for a given static
`grid_size`: the reference deduplicates interpolated points with
`torch.unique` (meshes.py:119), which produces data-dependent shapes;
we keep duplicates instead — every consumer here rasterizes the convex
hull of the point set, for which duplicates are irrelevant — so the
functions stay jittable.
"""

from __future__ import annotations

import jax.numpy as jnp

from .lie import transform_points


def make_superquadric(A, B, C, r, s, t, pose=None, grid_size: int = 10) -> jnp.ndarray:
    """Superquadric surface sample. Mirrors reference meshes.py:10-53.

    Returns (grid_size**2, 3) points in world frame.
    """
    if pose is None:
        pose = jnp.eye(4)
    eta_s = jnp.linspace(-jnp.pi / 2, jnp.pi / 2, grid_size)
    w_s = jnp.linspace(-jnp.pi, jnp.pi, grid_size)
    eta, w = jnp.meshgrid(eta_s, w_s, indexing="xy")

    cos_eta, sin_eta = jnp.cos(eta), jnp.sin(eta)
    cos_w, sin_w = jnp.cos(w), jnp.sin(w)

    def _spow(base, p):
        return jnp.sign(base) * jnp.abs(base) ** p

    x = A * _spow(cos_eta, r) * _spow(cos_w, r)
    y = B * _spow(cos_eta, s) * _spow(sin_w, s)
    z = C * _spow(sin_eta, s)

    points = jnp.stack([x.ravel(), y.ravel(), z.ravel()], axis=-1)
    if pose.ndim == 2:
        pose = pose[None]
    return transform_points(pose, points[None])[0]


def make_box(length, width, height, pose=None, grid_size: int = 11) -> jnp.ndarray:
    return make_superquadric(length / 2, width / 2, height / 2, 0.01, 0.01, 0.01, pose=pose, grid_size=grid_size)


def make_rounded_box(length, width, height, pose=None, grid_size: int = 11) -> jnp.ndarray:
    return make_superquadric(length / 2, width / 2, height / 2, 0.2, 0.2, 0.2, pose=pose, grid_size=grid_size)


def make_ellipsoid(length, width, height, pose=None, grid_size: int = 11) -> jnp.ndarray:
    return make_superquadric(length / 2, width / 2, height / 2, 1.0, 1.0, 1.0, pose=pose, grid_size=grid_size)


def _plane_corners(x=None, y=None, z=None) -> jnp.ndarray:
    """The 4 corner points of an axis-aligned plane (reference meshes.py:77-106)."""
    if x is None:
        pts = [[0.0, y / 2, z / 2], [0.0, -y / 2, z / 2], [0.0, -y / 2, -z / 2], [0.0, y / 2, -z / 2]]
    elif y is None:
        pts = [[x / 2, 0.0, z / 2], [x / 2, 0.0, -z / 2], [-x / 2, 0.0, -z / 2], [-x / 2, 0.0, z / 2]]
    elif z is None:
        pts = [[x / 2, y / 2, 0.0], [x / 2, -y / 2, 0.0], [-x / 2, -y / 2, 0.0], [-x / 2, y / 2, 0.0]]
    else:
        raise ValueError("make_plane requires exactly 2 of x, y, z")
    return jnp.asarray(pts, dtype=jnp.float32)


def make_plane(x=None, y=None, z=None, pose=None, grid_size: int = 10) -> jnp.ndarray:
    """Plane boundary sample: 4 corners plus `grid_size` lerp steps per
    edge (duplicates kept — see module docstring). Shape: (4 + 4*grid_size, 3).
    """
    if pose is None:
        pose = jnp.eye(4)
    corners = _plane_corners(x=x, y=y, z=z)
    pieces = [corners]
    if grid_size > 0:
        w = jnp.linspace(0.0, 1.0, grid_size)[:, None]
        for i in range(4):
            a, b = corners[i], corners[(i + 1) % 4]
            pieces.append(a[None] * (1 - w) + b[None] * w)
    points = jnp.concatenate(pieces, axis=0)
    if pose.ndim == 2:
        pose = pose[None]
    return transform_points(pose, points[None])[0]


def make_side_points(width: float, pose=None) -> jnp.ndarray:
    """The two lateral footprint points used to build footprint polygons.

    Equivalent to the reference's `make_plane(x=0.0, y=width, grid_size=2)`
    after `torch.unique` (nodes.py:516-519): exactly the 2 points
    (0, +width/2, 0) and (0, -width/2, 0) in the footprint frame.
    Order matches torch.unique's sorted output: (0,-w/2,0) first.
    """
    if pose is None:
        pose = jnp.eye(4)
    points = jnp.asarray([[0.0, -width / 2, 0.0], [0.0, width / 2, 0.0]], dtype=jnp.float32)
    if pose.ndim == 2:
        pose = pose[None]
    return transform_points(pose, points[None])[0]


def make_dense_plane(x=None, y=None, z=None, pose=None, grid_size: int = 5) -> jnp.ndarray:
    """Dense grid sample of a plane (reference meshes.py:127-153).
    Shape: (grid_size**2, 3) — the reference meshgrids 3 axes where one
    is a constant, yielding grid_size^2 unique locations replicated
    grid_size times; we emit the grid_size^2 unique points directly.
    """
    if pose is None:
        pose = jnp.eye(4)
    zeros = jnp.zeros((grid_size,), dtype=jnp.float32)
    if x is None:
        xs, ys, zs = zeros, jnp.linspace(-y / 2, y / 2, grid_size), jnp.linspace(-z / 2, z / 2, grid_size)
        a, b = jnp.meshgrid(ys, zs, indexing="xy")
        points = jnp.stack([jnp.zeros_like(a).ravel(), a.ravel(), b.ravel()], axis=-1)
    elif y is None:
        xs, zs = jnp.linspace(-x / 2, x / 2, grid_size), jnp.linspace(-z / 2, z / 2, grid_size)
        a, b = jnp.meshgrid(xs, zs, indexing="xy")
        points = jnp.stack([a.ravel(), jnp.zeros_like(a).ravel(), b.ravel()], axis=-1)
    elif z is None:
        xs, ys = jnp.linspace(-x / 2, x / 2, grid_size), jnp.linspace(-y / 2, y / 2, grid_size)
        a, b = jnp.meshgrid(xs, ys, indexing="xy")
        points = jnp.stack([a.ravel(), b.ravel(), jnp.zeros_like(a).ravel()], axis=-1)
    else:
        raise ValueError("make_dense_plane requires exactly 2 of x, y, z")
    if pose.ndim == 2:
        pose = pose[None]
    return transform_points(pose, points[None])[0]


def make_polygon_from_points(points: jnp.ndarray, grid_size: int = 10) -> jnp.ndarray:
    """Interpolate along the ordered boundary of a polygon.

    points: (B, 3) sorted boundary vertices -> (B * grid_size, 3).
    Mirrors reference meshes.py:156-165.
    """
    B = points.shape[0]
    w = jnp.linspace(0.0, 1.0, grid_size)[None, :, None]  # (1, G, 1)
    a = points[:, None, :]  # (B, 1, 3)
    b = jnp.roll(points, -1, axis=0)[:, None, :]
    interp = a * (1 - w) + b * w  # (B, G, 3)
    return interp.reshape(B * grid_size, 3)

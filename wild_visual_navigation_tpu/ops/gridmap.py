"""Ground-plane traversability grid map + SDF.

In the reference system, WVN publishes per-camera traversability images
that elevation_mapping_cupy fuses into a robot-centric grid with
`visual_traversability` / SDF layers, which smart_carrot consumes
(SURVEY.md §2.2). This module is the TPU-native stand-in for that
consumer-side fusion so the full navigation loop closes inside the
framework:

  per-pixel traversability -> flat-ground ray casting -> scatter-mean
  into a robot-centric grid -> chamfer signed-distance field ->
  scripts/smart_carrot.select_carrot.

Everything is jittable: ray/plane intersection in closed form, fusion
via scatter-add, SDF via fixed-iteration min-plus (chamfer) relaxation.
A full 2.5D elevation map is out of scope (no depth sensing in this
stack — the reference delegates that to elevation_mapping_cupy too).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class GridMap(NamedTuple):
    """Accumulated traversability grid (world-anchored)."""

    value_sum: jnp.ndarray  # (G, G) weighted sum of traversability
    weight: jnp.ndarray  # (G, G) accumulated weights
    origin_xy: jnp.ndarray  # (2,) world coords of cell (0, 0)
    resolution: float

    @property
    def traversability(self) -> jnp.ndarray:
        return jnp.where(self.weight > 0, self.value_sum / jnp.maximum(self.weight, 1e-6), 0.5)

    @property
    def valid(self) -> jnp.ndarray:
        return self.weight > 0


def gridmap_init(size: int = 64, resolution: float = 0.1, center_xy=(0.0, 0.0)) -> GridMap:
    half = size * resolution / 2.0
    origin = jnp.asarray([center_xy[0] - half, center_xy[1] - half], jnp.float32)
    return GridMap(
        value_sum=jnp.zeros((size, size), jnp.float32),
        weight=jnp.zeros((size, size), jnp.float32),
        origin_xy=origin,
        resolution=resolution,
    )


@partial(jax.jit, static_argnames=("stride",))
def project_traversability_to_grid(
    grid: GridMap,
    trav: jnp.ndarray,
    K: jnp.ndarray,
    pose_cam_in_world: jnp.ndarray,
    confidence: jnp.ndarray | None = None,
    max_range: float = 8.0,
    stride: int = 2,
) -> GridMap:
    """Fuse one traversability image into the grid.

    Pixels are back-projected as rays through the camera and intersected
    with the ground plane z=0 (the flat-ground assumption the footprint
    supervision also uses); hits within `max_range` scatter-add
    (confidence-weighted) traversability into their cells.

    trav: (H, W) in [0, 1]; K: (3, 3) scaled intrinsics for (H, W);
    pose_cam_in_world: (4, 4). `stride` subsamples pixels (the grid is
    far coarser than the image).
    """
    H, W = trav.shape
    ys = jnp.arange(0, H, stride, dtype=jnp.float32) + 0.5
    xs = jnp.arange(0, W, stride, dtype=jnp.float32) + 0.5
    vv, uu = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(uu)
    pix = jnp.stack([uu, vv, ones], axis=-1).reshape(-1, 3)  # (P, 3)

    Kinv = jnp.linalg.inv(K.astype(jnp.float32))
    R = pose_cam_in_world[:3, :3].astype(jnp.float32)
    origin = pose_cam_in_world[:3, 3].astype(jnp.float32)
    dirs = (R @ (Kinv @ pix.T)).T  # (P, 3) world-frame ray directions

    dz = dirs[:, 2]
    t = -origin[2] / jnp.where(jnp.abs(dz) < 1e-6, -1e-6, dz)
    # gate on the actual Euclidean camera-to-hit distance
    hit = (t > 0) & (t * jnp.linalg.norm(dirs, axis=-1) < max_range)
    world_xy = origin[None, :2] + t[:, None] * dirs[:, :2]

    cells = jnp.floor((world_xy - grid.origin_xy[None]) / grid.resolution).astype(jnp.int32)
    G = grid.weight.shape[0]
    in_grid = (cells[:, 0] >= 0) & (cells[:, 0] < G) & (cells[:, 1] >= 0) & (cells[:, 1] < G)
    ok = hit & in_grid
    flat_idx = jnp.where(ok, cells[:, 1] * G + cells[:, 0], G * G)  # OOB -> dropped

    vals = trav[::stride, ::stride].reshape(-1)
    w = confidence[::stride, ::stride].reshape(-1) if confidence is not None else jnp.ones_like(vals)
    w = jnp.where(ok, w, 0.0)

    value_sum = grid.value_sum.reshape(-1).at[flat_idx].add(vals * w, mode="drop").reshape(G, G)
    weight = grid.weight.reshape(-1).at[flat_idx].add(w, mode="drop").reshape(G, G)
    return grid._replace(value_sum=value_sum, weight=weight)


@jax.jit
def gridmap_recenter(grid: GridMap, new_center_xy: jnp.ndarray) -> GridMap:
    """Shift the grid so `new_center_xy` is at its center (robot-centric
    rolling map, like elevation_mapping's moving grid). Cells shifted in
    from outside are cleared; the shift snaps to whole cells so world
    anchoring stays exact."""
    G = grid.weight.shape[0]
    half = G * grid.resolution / 2.0
    new_origin_target = jnp.asarray(new_center_xy, jnp.float32) - half
    shift_cells = jnp.round((new_origin_target - grid.origin_xy) / grid.resolution).astype(jnp.int32)
    new_origin = grid.origin_xy + shift_cells.astype(jnp.float32) * grid.resolution

    def shift2d(a, fill):
        # shift content by -shift_cells (origin moves +, content moves -)
        sx, sy = shift_cells[0], shift_cells[1]
        rolled = jnp.roll(jnp.roll(a, -sy, axis=0), -sx, axis=1)
        ys = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
        valid = (ys + sy >= 0) & (ys + sy < G) & (xs + sx >= 0) & (xs + sx < G)
        return jnp.where(valid, rolled, fill)

    return grid._replace(
        value_sum=shift2d(grid.value_sum, 0.0),
        weight=shift2d(grid.weight, 0.0),
        origin_xy=new_origin,
    )


@partial(jax.jit, static_argnames=("iterations",))
def traversability_sdf(
    trav: jnp.ndarray,
    valid: jnp.ndarray,
    threshold: float = 0.5,
    resolution: float = 0.1,
    iterations: int = 64,
) -> jnp.ndarray:
    """Signed distance to the untraversable set via chamfer relaxation.

    Positive inside traversable space (distance to the nearest
    untraversable/unknown cell), negative inside untraversable space —
    the `sdf` layer smart_carrot consumes. Fixed-iteration 4-neighbor
    min-plus propagation (one iteration per cell of maximum distance).
    """
    blocked = (~valid) | (trav < threshold)
    big = 1e6

    def relax(dist):
        # non-wrapping 4-neighborhood (pad with +inf at the borders —
        # jnp.roll would leak distances across opposite edges)
        p = jnp.pad(dist, 1, constant_values=big)
        n = jnp.minimum(
            jnp.minimum(p[:-2, 1:-1], p[2:, 1:-1]),
            jnp.minimum(p[1:-1, :-2], p[1:-1, 2:]),
        )
        return jnp.minimum(dist, n + resolution)

    d_out = jnp.where(blocked, 0.0, big)  # distance to blocked set
    d_out = jax.lax.fori_loop(0, iterations, lambda _, d: relax(d), d_out)
    d_in = jnp.where(blocked, big, 0.0)  # distance to free set
    d_in = jax.lax.fori_loop(0, iterations, lambda _, d: relax(d), d_in)
    return jnp.where(blocked, -d_in, d_out)

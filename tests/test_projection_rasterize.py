"""Projection + rasterization tests, mirroring the reference's
`run_image_projector` scenario (image_projector.py:203-296) and
`test_kornia.py` dependency-contract checks (points behind the camera,
polygon fill)."""

import jax
import jax.numpy as jnp
import numpy as np

from wild_visual_navigation_tpu.ops import projection, rasterize
from wild_visual_navigation_tpu.utils import lie, meshes


def _camera_looking_down(B=1, H=120, W=160):
    K = jnp.asarray([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]])
    K = jnp.tile(K[None], (B, 1, 1))
    cam = projection.Camera(K=K, height=H, width=W)
    # Camera 2m above origin looking straight down: z_cam = -z_world.
    R = lie.so3_from_rpy(jnp.asarray([np.pi, 0.0, 0.0]))
    pose = lie.se3_matrix(R, jnp.asarray([0.0, 0.0, 2.0]))
    return cam, jnp.tile(pose[None], (B, 1, 1))


def test_project_center_point():
    cam, pose = _camera_looking_down()
    pts = jnp.zeros((1, 1, 3))  # world origin, 2m in front of camera
    p2d, valid, valid_z = projection.project_points(cam, pose, pts)
    np.testing.assert_allclose(np.asarray(p2d[0, 0]), [80.0, 60.0], atol=1e-4)
    assert bool(valid[0, 0]) and bool(valid_z[0, 0])


def test_project_behind_camera_invalid():
    cam, pose = _camera_looking_down()
    pts = jnp.asarray([[[0.0, 0.0, 5.0]]])  # above the camera -> behind
    _, valid, valid_z = projection.project_points(cam, pose, pts)
    assert not bool(valid_z[0, 0])
    assert not bool(valid[0, 0])


def test_scale_intrinsics_square_crop():
    # Square-output path uses fy for fx (image_projector.py:64-68).
    K = jnp.asarray([[720.0, 0, 720, 0], [0, 720.0, 540, 0], [0, 0, 1, 0], [0, 0, 0, 1]])[None]
    sK = projection.scale_intrinsics(K, h=1080, w=1440, new_h=224)
    s = 224 / 1080
    np.testing.assert_allclose(float(sK[0, 0, 0]), 720 * s, rtol=1e-6)
    np.testing.assert_allclose(float(sK[0, 0, 2]), 540 * s, rtol=1e-6)
    np.testing.assert_allclose(float(sK[0, 1, 1]), 720 * s, rtol=1e-6)


def test_convex_hull_square():
    pts = jnp.asarray([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [5.0, 5.0]])
    valid = jnp.ones((5,), dtype=bool)
    hull, hv = rasterize.convex_hull(pts, valid, max_hull=8)
    assert int(jnp.sum(hv)) == 4  # interior point excluded
    hull_np = np.asarray(hull[np.asarray(hv)])
    corners = {(0, 0), (10, 0), (10, 10), (0, 10)}
    got = {tuple(map(round, p)) for p in hull_np}
    assert got == corners


def test_fill_square_mask():
    pts = jnp.asarray([[2.0, 3.0], [12.0, 3.0], [12.0, 9.0], [2.0, 9.0]])
    valid = jnp.ones((4,), dtype=bool)
    mask = rasterize.rasterize_points_hull(pts[None], valid[None], 16, 20)[0]
    m = np.asarray(mask)
    assert m[5, 5] and m[3, 2] and m[9, 12]
    assert not m[0, 0] and not m[10, 13] and not m[15, 19]
    # area ~ (12-2+1)*(9-3+1)
    assert abs(m.sum() - 11 * 7) <= 12


def test_fill_fewer_than_3_points_empty():
    pts = jnp.asarray([[2.0, 3.0], [12.0, 3.0], [0.0, 0.0], [0.0, 0.0]])
    valid = jnp.asarray([True, True, False, False])
    mask = rasterize.rasterize_points_hull(pts[None], valid[None], 16, 20)[0]
    assert int(jnp.sum(mask)) == 0


def test_project_and_render_footprint():
    """A ground-plane footprint polygon below a downward camera fills a
    centered square region (run_image_projector analogue)."""
    cam, pose = _camera_looking_down(B=2)
    square = jnp.asarray([[0.5, 0.5, 0.0], [-0.5, 0.5, 0.0], [-0.5, -0.5, 0.0], [0.5, -0.5, 0.0]])
    poly = meshes.make_polygon_from_points(square, grid_size=10)  # (40, 3)
    pts = jnp.tile(poly[None], (2, 1, 1))
    inside, p2d, valid = rasterize.project_and_render(cam, pose, pts)
    m = np.asarray(inside[0])
    # 1m square at 2m depth, f=100 -> 50px wide, centered at (80, 60).
    assert m[60, 80]
    assert m[60 - 20, 80 - 20] and m[60 + 20, 80 + 20]
    assert not m[60, 80 - 30] and not m[60 - 30, 80]
    expected_area = 50 * 50
    assert abs(m.sum() - expected_area) / expected_area < 0.1
    # Batch items identical
    np.testing.assert_array_equal(m, np.asarray(inside[1]))


def test_project_and_render_behind_camera_empty():
    cam, pose = _camera_looking_down()
    square = jnp.asarray([[0.5, 0.5, 5.0], [-0.5, 0.5, 5.0], [-0.5, -0.5, 5.0], [0.5, -0.5, 5.0]])
    pts = meshes.make_polygon_from_points(square, grid_size=5)[None]
    inside, _, _ = rasterize.project_and_render(cam, pose, pts)
    assert int(jnp.sum(inside)) == 0


def test_rasterize_jit_and_grad_safe():
    # The rasterizer sits inside the jitted supervision pipeline; it
    # must trace with batched poses.
    cam, pose = _camera_looking_down(B=4)
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (4, 30, 3), minval=-1.0, maxval=1.0)

    @jax.jit
    def f(pose, pts):
        inside, _, _ = rasterize.project_and_render(cam, pose, pts)
        return inside

    out = f(pose, pts)
    assert out.shape == (4, 120, 160)


def test_pallas_fill_matches_scan():
    """The Pallas fill kernel (interpret mode on CPU) must match the
    lax.scan fallback exactly."""
    from wild_visual_navigation_tpu.ops.rasterize import convex_hull, fill_convex_hull
    from wild_visual_navigation_tpu.ops.rasterize_pallas import fill_hulls_pallas

    key = jax.random.PRNGKey(0)
    B, N, H, W = 3, 24, 48, 56
    pts = jax.random.uniform(key, (B, N, 2)) * jnp.asarray([W, H]) * 1.2 - 5.0
    valid = jax.random.uniform(jax.random.fold_in(key, 1), (B, N)) < 0.8

    hulls, hvs = jax.vmap(lambda p, v: convex_hull(p, v, max_hull=16))(pts, valid)
    ref = jax.vmap(lambda h, v: fill_convex_hull(h, v, H, W))(hulls, hvs)
    out = fill_hulls_pallas(hulls, hvs, H, W, block_h=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pallas_fill_degenerate_and_invalid():
    from wild_visual_navigation_tpu.ops.rasterize_pallas import fill_hulls_pallas

    hulls = jnp.zeros((2, 8, 2))
    hv = jnp.zeros((2, 8), bool)
    out = fill_hulls_pallas(hulls, hv, 16, 16, block_h=8, interpret=True)
    assert int(jnp.sum(out)) == 0

"""SO(3)/SE(3) invariants, mirroring the reference's `run_base_state`
assertions (nodes.py:667-686) plus round-trip identities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wild_visual_navigation_tpu.utils import lie


def random_se3(key, batch=()):
    k1, k2 = jax.random.split(key)
    phi = jax.random.uniform(k1, batch + (3,), minval=-1.5, maxval=1.5)
    t = jax.random.uniform(k2, batch + (3,), minval=-5, maxval=5)
    return lie.se3_matrix(lie.so3_exp(phi), t)


def test_so3_exp_log_roundtrip():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    # log is only the inverse of exp on the principal domain |phi| < pi.
    direction = jax.random.normal(k1, (64, 3))
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    mag = jax.random.uniform(k2, (64, 1), minval=0.0, maxval=2.8)
    phi = direction * mag
    R = lie.so3_exp(phi)
    phi2 = lie.so3_log(R)
    np.testing.assert_allclose(np.asarray(phi), np.asarray(phi2), atol=1e-4)
    # Orthonormality
    RtR = jnp.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(np.asarray(RtR), np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)


def test_so3_exp_small_angle():
    phi = jnp.zeros((3,))
    R = lie.so3_exp(phi)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
    # Gradient is finite at the identity
    g = jax.grad(lambda p: jnp.sum(lie.so3_exp(p)))(phi)
    assert np.all(np.isfinite(np.asarray(g)))


def test_se3_exp_log_roundtrip():
    key = jax.random.PRNGKey(1)
    xi = jax.random.uniform(key, (32, 6), minval=-1.0, maxval=1.0)
    T = lie.se3_exp(xi)
    xi2 = lie.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-4)


def test_se3_inverse():
    T = random_se3(jax.random.PRNGKey(2), (16,))
    eye = T @ lie.se3_inverse(T)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(4), (16, 1, 1)), atol=1e-5)


def test_quat_roundtrip():
    key = jax.random.PRNGKey(3)
    phi = jax.random.uniform(key, (32, 3), minval=-2.0, maxval=2.0)
    R = lie.so3_exp(phi)
    q = lie.rot_to_quat(R)
    R2 = lie.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)


def test_pose_distance_matches_translation():
    # For identity rotation, SE3-log distance equals euclidean distance
    # (reference BaseNode.distance_to, nodes.py:76-93).
    Ta = lie.se3_matrix(jnp.eye(3), jnp.asarray([0.0, 0.0, 0.0]))
    Tb = lie.se3_matrix(jnp.eye(3), jnp.asarray([3.0, 4.0, 0.0]))
    d = lie.pose_distance(Ta, Tb)
    assert pytest.approx(5.0, abs=1e-5) == float(d)


def test_rpy_matches_euler_composition():
    rpy = jnp.asarray([0.3, -0.2, 1.1])
    R = lie.so3_from_rpy(rpy)

    def rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    expected = rz(1.1) @ ry(-0.2) @ rx(0.3)
    np.testing.assert_allclose(np.asarray(R), expected, atol=1e-6)


def test_transform_points():
    T = lie.se3_matrix(lie.so3_from_rpy(jnp.asarray([0.0, 0.0, np.pi / 2])), jnp.asarray([1.0, 0.0, 0.0]))
    pts = jnp.asarray([[[1.0, 0.0, 0.0]]])
    out = lie.transform_points(T[None], pts)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [1.0, 1.0, 0.0], atol=1e-6)

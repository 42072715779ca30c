"""SO(3)/SE(3) Lie-group operations in pure jnp.

TPU-native replacement for the reference's `liegroups.torch.SE3/SO3`
(used in /root/reference/wild_visual_navigation/traversability_estimator/nodes.py:13,
supervision_generator/supervision_generator.py:10). Everything here is
batched, jittable, and differentiable; no data-dependent control flow.

Conventions: rotations are 3x3 matrices, poses are 4x4 homogeneous
matrices. Tangent vectors are `[rho (3), phi (3)]` = [translation,
rotation] matching liegroups' `SE3.log()` ordering (position first),
which the reference relies on at nodes.py:76-93 (`.log()[:3].norm()`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator. v: (..., 3) -> (..., 3, 3) skew-symmetric."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat. m: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def _matmul33(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """3x3 matmul at full fp32 precision.

    On TPU the MXU's default precision truncates inputs to bfloat16,
    which is catastrophic for pose chains; geometry matmuls in this
    module always request HIGHEST precision (they are tiny anyway).
    """
    return jnp.einsum("...ij,...jk->...ik", a, b, precision=jax.lax.Precision.HIGHEST)


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula. phi: (..., 3) -> (..., 3, 3).

    Uses series-expansion coefficients near zero so it is safe under jit
    and differentiable at the identity (double-where trick keeps the
    unused branch NaN-free in the backward pass).
    """
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta_safe = jnp.sqrt(theta2_safe)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta_safe) / theta_safe)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta_safe)) / theta2_safe)
    K = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * _matmul33(K, K)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map of SO(3). R: (..., 3, 3) -> (..., 3).

    Branch-free over three regimes: series near theta ~ 0, the generic
    theta/(2 sin theta) formula, and an axis-from-symmetric-part
    construction near theta ~ pi where vee(R - R^T) degenerates to zero
    (matching liegroups' full-range behavior the reference relies on).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    theta2 = theta * theta
    small = theta2 < 1e-8
    near_pi = cos_theta < -1.0 + 1e-5
    w = vee(R - jnp.swapaxes(R, -1, -2))  # = 2 sin(theta) * axis
    sin_safe = jnp.where(small | near_pi, 1.0, jnp.sin(theta))
    # theta / (2 sin(theta)) with series fallback 1/2 + theta^2/12
    scale = jnp.where(small, 0.5 + theta2 / 12.0, theta / (2.0 * sin_safe))
    generic = scale[..., None] * w

    # Near pi: R ~ cos(t) I + (1-cos t) a a^T, so the outer product
    # (R + R^T)/2 - cos(t) I = (1-cos t) a a^T yields the axis from its
    # dominant column; the residual skew part fixes the sign (at exactly
    # pi the sign is immaterial — +pi*a and -pi*a are the same rotation).
    eye = jnp.eye(3, dtype=R.dtype)
    S = 0.5 * (R + jnp.swapaxes(R, -1, -2)) - cos_theta[..., None, None] * eye
    diag = jnp.diagonal(S, axis1=-2, axis2=-1)
    onehot = jax.nn.one_hot(jnp.argmax(diag, axis=-1), 3, dtype=R.dtype)
    col = jnp.einsum("...ij,...j->...i", S, onehot, precision=jax.lax.Precision.HIGHEST)
    axis = col / (jnp.linalg.norm(col, axis=-1, keepdims=True) + _EPS)
    sgn = jnp.where(jnp.sum(axis * w, axis=-1) < 0.0, -1.0, 1.0)
    pi_val = (theta * sgn)[..., None] * axis
    return jnp.where(near_pi[..., None], pi_val, generic)


def so3_from_rpy(rpy: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix from roll-pitch-yaw (XYZ extrinsic, matching
    liegroups `SO3.from_rpy`): R = Rz(yaw) @ Ry(pitch) @ Rx(roll)."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (x, y, z, w) -> rotation matrix (..., 3, 3).

    ROS message ordering (x, y, z, w), matching the reference's
    ros_converter.py usage.
    """
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1)
    row1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1)
    row2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w); branch-free (jittable)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick numerically-stable one by mask.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) * 0.5
    c0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), 4.0 * qw0 * qw0], axis=-1) / (4.0 * qw0[..., None])

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 0.5
    c1 = jnp.stack([4.0 * qx1 * qx1, (m01 + m10), (m02 + m20), (m21 - m12)], axis=-1) / (4.0 * qx1[..., None])

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 0.5
    c2 = jnp.stack([(m01 + m10), 4.0 * qy2 * qy2, (m12 + m21), (m02 - m20)], axis=-1) / (4.0 * qy2[..., None])

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 0.5
    c3 = jnp.stack([(m02 + m20), (m12 + m21), 4.0 * qz3 * qz3, (m10 - m01)], axis=-1) / (4.0 * qz3[..., None])

    cond0 = tr > 0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None], c0, jnp.where(cond1[..., None], c1, jnp.where(cond2[..., None], c2, c3))
    )
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)


def _so3_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J of SO(3)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    # (1 - cos t)/t^2 and (t - sin t)/t^3 with series fallbacks
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2_safe * theta))
    K = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + b[..., None, None] * K + c[..., None, None] * _matmul33(K, K)


def _so3_left_jacobian_inv(phi: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(phi * phi, axis=-1)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    half = theta * 0.5
    sin_half_safe = jnp.where(small, 1.0, jnp.sin(half))
    cot_coeff = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / sin_half_safe) / theta2_safe,
    )
    K = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - 0.5 * K + cot_coeff[..., None, None] * _matmul33(K, K)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Exp map of SE(3). xi: (..., 6) = [rho, phi] -> (..., 4, 4)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    J = _so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", J, rho, precision=jax.lax.Precision.HIGHEST)
    T = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """Log map of SE(3). T: (..., 4, 4) -> (..., 6) = [rho, phi]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3_log(R)
    Jinv = _so3_left_jacobian_inv(phi)
    rho = jnp.einsum("...ij,...j->...i", Jinv, t, precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of homogeneous transforms without a linear solve."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t, precision=jax.lax.Precision.HIGHEST)
    Tinv = jnp.zeros_like(T)
    Tinv = Tinv.at[..., :3, :3].set(Rt)
    Tinv = Tinv.at[..., :3, 3].set(ti)
    Tinv = Tinv.at[..., 3, 3].set(1.0)
    return Tinv


def se3_matrix(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Build (..., 4, 4) pose from rotation (..., 3, 3) and translation (..., 3)."""
    T = jnp.zeros(R.shape[:-2] + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def transform_points(T: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply homogeneous transform(s) to points.

    T: (..., 4, 4), points: (..., N, 3) -> (..., N, 3). Matches
    kornia.geometry.linalg.transform_points used throughout the
    reference (image_projector.py:141, meshes.py:53).
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, points, precision=jax.lax.Precision.HIGHEST) + t[..., None, :]


def pose_distance(T_a: jnp.ndarray, T_b: jnp.ndarray) -> jnp.ndarray:
    """Translational distance between two poses via SE(3) log, matching
    BaseNode.distance_to (nodes.py:76-93): ||log(T_a^-1 T_b)[:3]||."""
    rel = _matmul33(se3_inverse(T_a), T_b)
    return jnp.linalg.norm(se3_log(rel)[..., :3], axis=-1)

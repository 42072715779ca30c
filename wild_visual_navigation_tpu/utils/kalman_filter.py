"""Generic linear Kalman filter as a pure function over explicit state.

TPU-native replacement for the reference's nn.Module KF
(/root/reference/wild_visual_navigation/utils/kalman_filter.py:10-132),
used by the SupervisionGenerator (velocity-tracking smoothing) and the
ConfidenceGenerator. The filter matrices are a pytree; the update is a
jittable pure function so it can live inside the fused supervision /
train steps. Outlier rejection (none / hard / huber, reference
kalman_filter.py:110-127) is branch-free via `jnp.where`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class KalmanState(NamedTuple):
    x: jnp.ndarray  # (D,) state estimate
    P: jnp.ndarray  # (D, D) state covariance


@dataclass(frozen=True)
class KalmanFilterParams:
    """Filter configuration. Matrices are (D, D) (or (D, C) control).

    `outlier_rejection` is a static python string — it selects which
    weight formula is traced, mirroring the reference's constructor
    argument.
    """

    proc_model: jnp.ndarray
    proc_cov: jnp.ndarray
    meas_model: jnp.ndarray
    meas_cov: jnp.ndarray
    control_model: Optional[jnp.ndarray] = None
    outlier_rejection: str = "none"
    outlier_delta: float = 1.0

    @staticmethod
    def make(
        dim_state: int = 1,
        proc_cov: float = 1.0,
        meas_cov: float = 1.0,
        outlier_rejection: str = "none",
        outlier_delta: float = 1.0,
    ) -> "KalmanFilterParams":
        eye = jnp.eye(dim_state, dtype=jnp.float32)
        return KalmanFilterParams(
            proc_model=eye,
            proc_cov=eye * proc_cov,
            meas_model=eye,
            meas_cov=eye * meas_cov,
            control_model=None,
            outlier_rejection=outlier_rejection,
            outlier_delta=outlier_delta,
        )


def kf_init(dim_state: int = 1, cov: float = 0.1) -> KalmanState:
    return KalmanState(
        x=jnp.zeros((dim_state,), dtype=jnp.float32),
        P=jnp.eye(dim_state, dtype=jnp.float32) * cov,
    )


def _outlier_weight(params: KalmanFilterParams, innovation: jnp.ndarray) -> jnp.ndarray:
    if params.outlier_rejection == "none":
        return jnp.asarray(1.0, dtype=jnp.float32)
    cov_inv = jnp.linalg.inv(params.meas_cov)
    r = jnp.sqrt(innovation @ cov_inv @ innovation)
    if params.outlier_rejection == "hard":
        return jnp.where(r >= params.outlier_delta, 0.0, 1.0)
    if params.outlier_rejection == "huber":
        return jnp.where(jnp.abs(r) <= params.outlier_delta, 1.0, params.outlier_delta / jnp.abs(r))
    raise ValueError(f"invalid outlier_rejection [{params.outlier_rejection}]")


def kf_step(
    params: KalmanFilterParams,
    state: KalmanState,
    meas: jnp.ndarray,
    control: Optional[jnp.ndarray] = None,
) -> KalmanState:
    """One predict+correct cycle (reference kalman_filter.py:79-132)."""
    A, Q = params.proc_model, params.proc_cov
    H, R = params.meas_model, params.meas_cov

    # Prediction
    x = A @ state.x
    if control is not None and params.control_model is not None:
        x = x + params.control_model @ control
    P = A @ state.P @ A.T + Q

    # Correction
    meas = jnp.atleast_1d(jnp.asarray(meas, dtype=jnp.float32))
    innovation = meas - H @ x
    w = _outlier_weight(params, innovation)
    S = H @ P @ H.T + R
    K = w * (P @ H.T @ jnp.linalg.inv(S))
    x = x + K @ innovation
    P = (jnp.eye(x.shape[0], dtype=P.dtype) - K @ H) @ P
    return KalmanState(x=x, P=P)


def kf_scan(params: KalmanFilterParams, state: KalmanState, measurements: jnp.ndarray):
    """Filter a whole (T, D) measurement sequence with lax.scan; returns
    the final state and the (T, D) filtered trajectory. Replaces the
    reference's python loop in run_kalman_filter (kalman_filter.py:189)."""

    def body(s, m):
        s2 = kf_step(params, s, m)
        return s2, s2.x

    return jax.lax.scan(body, state, measurements)

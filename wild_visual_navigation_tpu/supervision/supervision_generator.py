"""Proprioceptive supervision-signal generation.

Re-design of the reference SupervisionGenerator
(/root/reference/wild_visual_navigation/supervision_generator/supervision_generator.py:15-183):
traversability = sigmoid(-slope * (KF(velocity tracking error) - cutoff)),
with a velocity-component selection matrix and an alternative
pose-prediction-error mode integrating desired twists over a horizon.
Defaults follow the reference's production node construction
(wvn_learning_node.py:95-106), not its offline demo.

The KF update is a tiny jittable function; at 10 Hz host-dispatch cost
dominates anyway, so `update_velocity_tracking` also accepts numpy and
keeps the filter state as part of this object (explicitly accessible
for checkpointing).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.kalman_filter import KalmanFilterParams, KalmanState
from ..utils.lie import se3_exp
from ..traversability.graphs import DistanceWindowGraph
from ..traversability.nodes import TwistNode, se3_log_translation_np, _so3_log_np

_COMPONENTS = ["vx", "vy", "vz", "wx", "wy", "wz"]


def velocity_selection_matrix(velocities: List[str]) -> np.ndarray:
    """reference supervision_generator.py:70-85."""
    rows = [np.eye(6)[_COMPONENTS.index(v)] for v in _COMPONENTS if v in velocities]
    return np.stack(rows).astype(np.float32)


class SupervisionGenerator:
    def __init__(
        self,
        kf_process_cov: float = 0.1,
        kf_meas_cov: float = 10.0,
        kf_outlier_rejection: str = "huber",
        kf_outlier_rejection_delta: float = 0.5,
        sigmoid_slope: float = 20.0,
        sigmoid_cutoff: float = 0.25,
        untraversable_thr: float = 0.05,
        time_horizon: float = 0.05,
        graph_max_length: float = 1.0,
    ):
        self._kf_params = KalmanFilterParams.make(
            1,
            proc_cov=kf_process_cov,
            meas_cov=kf_meas_cov,
            outlier_rejection=kf_outlier_rejection,
            outlier_delta=kf_outlier_rejection_delta,
        )
        self._kf_state = KalmanState(x=np.zeros((1,), np.float32), P=np.eye(1, dtype=np.float32) * 0.1)
        # Host-scalar cache of the (device-array) filter matrices: the
        # per-step host KF must never touch device memory (each float()
        # of a device scalar is a full D2H round trip).
        self._kf_host = {
            "A": float(self._kf_params.proc_model[0, 0]),
            "Q": float(self._kf_params.proc_cov[0, 0]),
            "H": float(self._kf_params.meas_model[0, 0]),
            "R": float(self._kf_params.meas_cov[0, 0]),
        }
        self._sigmoid_slope = sigmoid_slope
        self._sigmoid_cutoff = sigmoid_cutoff
        self._untraversable_thr = untraversable_thr
        self._time_horizon = time_horizon
        self._graph_twist = DistanceWindowGraph(max_distance=graph_max_length, edge_distance=0.0)
        self._traversability = 0.5
        self._traversability_var = 1.0
        self._is_untraversable = False

    def _squash(self, error: float) -> Tuple[float, float, bool]:
        """Negative-argument sigmoid stretch + clamp (reference :116-128)."""
        trav = float(1.0 / (1.0 + np.exp(self._sigmoid_slope * (error - self._sigmoid_cutoff))))
        self._is_untraversable = trav < self._untraversable_thr
        self._traversability = float(np.clip(trav, 0.001, 1.0))
        self._traversability_var = 1.0
        return self._traversability, self._traversability_var, self._is_untraversable

    def _kf_step_host(self, error: float) -> float:
        """1-D KF update in numpy. The filter is scalar; dispatching it
        to the device costs a full host->device round trip per robot
        state (tens of ms through a remote tunnel) for microseconds of
        math. Numerics identical to utils.kalman_filter.kf_step."""
        p = self._kf_params
        x = float(self._kf_state.x[0])
        P = float(self._kf_state.P[0, 0])
        A, Q = self._kf_host["A"], self._kf_host["Q"]
        Hm, R = self._kf_host["H"], self._kf_host["R"]
        x = A * x
        P = A * P * A + Q
        innov = error - Hm * x
        w = 1.0
        if p.outlier_rejection != "none":
            r = abs(innov) / np.sqrt(R)
            if p.outlier_rejection == "hard":
                w = 0.0 if r >= p.outlier_delta else 1.0
            elif p.outlier_rejection == "huber":
                w = 1.0 if r <= p.outlier_delta else p.outlier_delta / r
        S_cov = Hm * P * Hm + R
        K = w * P * Hm / S_cov
        x = x + K * innov
        P = (1.0 - K * Hm) * P
        self._kf_state = KalmanState(x=np.asarray([x], np.float32), P=np.asarray([[P]], np.float32))
        return x

    def update_velocity_tracking(
        self,
        current_velocity: np.ndarray,
        desired_velocity: np.ndarray,
        max_velocity: float = 1.0,
        velocities: List[str] = _COMPONENTS,
    ) -> Tuple[float, float, bool]:
        """reference :87-128."""
        S = velocity_selection_matrix(velocities)
        cur = np.asarray(current_velocity, dtype=np.float32).reshape(-1)[:6]
        des = np.asarray(desired_velocity, dtype=np.float32).reshape(-1)[:6]
        # accept short twists (e.g. linear-only (vx, vy, vz)); missing
        # components read as zero, like an Odometry with empty angular
        if cur.size < 6:
            cur = np.pad(cur, (0, 6 - cur.size))
        if des.size < 6:
            des = np.pad(des, (0, 6 - des.size))
        error = float(np.mean((S @ cur - S @ des) ** 2)) / max_velocity
        return self._squash(self._kf_step_host(error))

    def update_pose_prediction(
        self,
        timestamp: float,
        current_pose_in_world: np.ndarray,
        current_velocity: np.ndarray,
        desired_velocity: np.ndarray,
        velocities: List[str] = _COMPONENTS,
    ) -> Tuple[float, float, bool]:
        """Alternative mode (reference :130-170): integrate desired
        twists over the horizon via SE(3) exp and compare to the actual
        pose."""
        self._graph_twist.add_node(
            TwistNode(
                timestamp=timestamp,
                pose_base_in_world=np.asarray(current_pose_in_world, dtype=np.float64),
                desired_twist=np.asarray(desired_velocity, dtype=np.float64),
                current_twist=np.asarray(current_velocity, dtype=np.float64),
            )
        )
        nodes = self._graph_twist.get_nodes_within_timespan(timestamp - self._time_horizon, timestamp)
        if not nodes:
            return self._squash(0.0)
        predicted = nodes[0].pose_base_in_world.copy()
        for node_t, node_tm1 in zip(nodes[1:], nodes[:-1]):
            dt = node_t.timestamp - node_tm1.timestamp
            v = np.asarray(node_tm1.desired_twist, dtype=np.float32) * dt
            predicted = predicted @ np.asarray(se3_exp(jnp.asarray(v)), dtype=np.float64)
        S = velocity_selection_matrix(velocities)
        rel = np.linalg.inv(np.asarray(current_pose_in_world, dtype=np.float64)) @ predicted
        xi = np.concatenate([se3_log_translation_np(rel), _so3_log_np(rel[:3, :3])])
        error = float(np.linalg.norm(S @ xi.astype(np.float32)))
        return self._squash(error)

    @property
    def traversability(self) -> float:
        return self._traversability

    @property
    def traversability_var(self) -> float:
        return self._traversability_var

    @property
    def untraversable_thr(self) -> float:
        return self._untraversable_thr

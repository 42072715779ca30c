"""Online confidence estimation over reconstruction losses.

TPU-native re-design of the reference ConfidenceGenerator
(/root/reference/wild_visual_navigation/utils/confidence_generator.py:13-212).
The reference is a stateful nn.Module mutating buffers; here the state
is an explicit NamedTuple carried through the jitted train step (and
serialized into checkpoints exactly like the reference stores
mean/var/std in `.tmp_state_dict.pt`, wvn_learning_node.py:387-388).

All four reference methods are implemented:
  * latest_measurement (default) — mean/std of this step's positive
    losses (confidence_generator.py:78-82);
  * running_mean — accumulator-based global Gaussian fit (:94-115);
  * kalman_filter — KF-smoothed mean + gaussian falloff (:131-145);
  * moving_average — stats over a 5-slot window of positive batches
    (:117-129), realized as a fixed-shape ring buffer.

Masking convention: instead of the reference's gather `x[y_valid]`
(dynamic shape), update() takes the full padded loss vector plus a
positive mask; empty-positive steps keep the previous statistics (the
reference would propagate NaN via `mean()` of an empty tensor for
latest_measurement; its kalman_filter method explicitly skips — we
adopt the skip semantics for every method).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .kalman_filter import KalmanFilterParams, KalmanState, kf_step

_WINDOW = 5  # moving_average window size (reference :71)


class ConfidenceState(NamedTuple):
    mean: jnp.ndarray  # ()
    var: jnp.ndarray  # ()
    std: jnp.ndarray  # ()
    # running_mean accumulators (fp32; the reference uses fp64, which
    # TPUs lack natively — at these magnitudes fp32 is sufficient and
    # exercised by tests).
    running_n: jnp.ndarray  # ()
    running_sum: jnp.ndarray  # ()
    running_sum2: jnp.ndarray  # ()
    # moving_average ring buffer of per-step (mean, var-sum, count)
    window_sum: jnp.ndarray  # (W,)
    window_sum2: jnp.ndarray  # (W,)
    window_n: jnp.ndarray  # (W,)
    window_ptr: jnp.ndarray  # () int32
    # kalman_filter covariance
    kf_cov: jnp.ndarray  # ()


def confidence_init() -> ConfidenceState:
    z = jnp.zeros((), jnp.float32)
    return ConfidenceState(
        mean=z,
        var=jnp.ones((), jnp.float32),
        std=jnp.ones((), jnp.float32),
        running_n=z,
        running_sum=z,
        running_sum2=z,
        window_sum=jnp.zeros((_WINDOW,), jnp.float32),
        window_sum2=jnp.zeros((_WINDOW,), jnp.float32),
        window_n=jnp.zeros((_WINDOW,), jnp.float32),
        window_ptr=jnp.zeros((), jnp.int32),
        kf_cov=jnp.ones((), jnp.float32),
    )


@dataclass(frozen=True)
class ConfidenceConfig:
    std_factor: float = 0.7
    method: str = "latest_measurement"

    def __post_init__(self):
        if self.method not in ("latest_measurement", "running_mean", "kalman_filter", "moving_average"):
            raise ValueError(f"Unknown method {self.method}")


def _masked_stats(x: jnp.ndarray, mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(mean, unbiased std, count) over masked entries; std matches
    torch.std's ddof=1 default used by the reference."""
    m = mask.astype(jnp.float32)
    n = jnp.sum(m)
    mean = jnp.sum(x * m) / jnp.maximum(n, 1.0)
    var = jnp.sum(((x - mean) ** 2) * m) / jnp.maximum(n - 1.0, 1.0)
    return mean, jnp.sqrt(var), n


def confidence_inference(cfg: ConfidenceConfig, state: ConfidenceState, x: jnp.ndarray) -> jnp.ndarray:
    """inference_without_update (confidence_generator.py:182-193):
    clip to [max(shifted_mean - std, 0), shifted_mean + std] and map
    linearly 1 -> 0."""
    shifted_mean = state.mean + state.std * cfg.std_factor
    interval_min = jnp.maximum(shifted_mean - state.std, 0.0)
    interval_max = shifted_mean + state.std
    xc = jnp.clip(x, interval_min, interval_max)
    width = jnp.maximum(interval_max - interval_min, 1e-12)
    return (1.0 - (xc - interval_min) / width).astype(jnp.float32)


def confidence_update(
    cfg: ConfidenceConfig,
    state: ConfidenceState,
    x: jnp.ndarray,
    pos_mask: jnp.ndarray,
) -> Tuple[ConfidenceState, jnp.ndarray]:
    """One update step; returns (new_state, per-sample confidence of x).

    x: (N,) losses (padded); pos_mask: (N,) bool marking the positive
    (footprint-labeled, non-padding) samples the statistics are fit to.
    """
    mean_p, std_p, n_p = _masked_stats(x, pos_mask)
    has_pos = n_p > 0

    if cfg.method == "latest_measurement":
        new_mean = jnp.where(has_pos, mean_p, state.mean)
        new_std = jnp.where(has_pos, std_p, state.std)
        state = state._replace(mean=new_mean, std=new_std, var=new_std**2)
        return state, confidence_inference(cfg, state, x)

    if cfg.method == "running_mean":
        rn = state.running_n + n_p
        rs = state.running_sum + jnp.sum(jnp.where(pos_mask, x, 0.0))
        rs2 = state.running_sum2 + jnp.sum(jnp.where(pos_mask, x * x, 0.0))
        mean = rs / jnp.maximum(rn, 1.0)
        var = jnp.maximum(rs2 / jnp.maximum(rn, 1.0) - mean**2, 0.0)
        state = state._replace(
            running_n=rn, running_sum=rs, running_sum2=rs2, mean=mean, var=var, std=jnp.sqrt(var)
        )
        return state, confidence_inference(cfg, state, x)

    if cfg.method == "kalman_filter":
        # reference: proc_cov 0.2, meas_cov 1.0 (confidence_generator.py:40-41)
        kfp = KalmanFilterParams.make(1, proc_cov=0.2, meas_cov=1.0)
        ks = KalmanState(x=state.mean[None], P=state.kf_cov[None, None])
        ks2 = kf_step(kfp, ks, mean_p[None])
        new_mean = jnp.where(has_pos, ks2.x[0], state.mean)
        new_cov = jnp.where(has_pos, ks2.P[0, 0], state.kf_cov)
        new_std = jnp.sqrt(new_cov)
        state = state._replace(mean=new_mean, kf_cov=new_cov, var=new_cov, std=new_std)
        conf = jnp.exp(-(((x - new_mean) / (new_std * cfg.std_factor)) ** 2) * 0.5)
        conf = jnp.where(x < new_mean, 1.0, conf)
        return state, conf.astype(jnp.float32)

    # moving_average: window stats over the last 5 positive batches
    # (sum/sum2/count per slot reproduce mean/std over the concatenated
    # window without storing raw samples). Empty-positive steps must not
    # write (and advance past) a zero-count slot — that would evict a
    # real batch's statistics, violating the skip semantics above.
    ptr = state.window_ptr % _WINDOW
    wsum = state.window_sum.at[ptr].set(
        jnp.where(has_pos, jnp.sum(jnp.where(pos_mask, x, 0.0)), state.window_sum[ptr])
    )
    wsum2 = state.window_sum2.at[ptr].set(
        jnp.where(has_pos, jnp.sum(jnp.where(pos_mask, x * x, 0.0)), state.window_sum2[ptr])
    )
    wn = state.window_n.at[ptr].set(jnp.where(has_pos, n_p, state.window_n[ptr]))
    n_tot = jnp.sum(wn)
    mean = jnp.sum(wsum) / jnp.maximum(n_tot, 1.0)
    # unbiased (ddof=1) like torch.std on the concatenated window
    var = (jnp.sum(wsum2) - n_tot * mean**2) / jnp.maximum(n_tot - 1.0, 1.0)
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    state = state._replace(
        window_sum=wsum, window_sum2=wsum2, window_n=wn,
        window_ptr=state.window_ptr + has_pos.astype(jnp.int32),
        mean=mean, var=jnp.maximum(var, 0.0), std=std,
    )
    # reference :126-128: clip to mean +- 2 std, then min-max normalize.
    xc = jnp.clip(x, mean - 2 * std, mean + 2 * std)
    lo, hi = jnp.min(xc), jnp.max(xc)
    conf = (xc - lo) / jnp.maximum(hi - lo, 1e-12)
    return state, conf.astype(jnp.float32)


def confidence_reset(state: ConfidenceState) -> ConfidenceState:
    """Reset statistics (reference reset_* methods)."""
    return confidence_init()


def confidence_state_dict(state: ConfidenceState) -> dict:
    """Checkpoint payload matching the reference's hot-swap dict
    {mean, var, std} (confidence_generator.py:211-212)."""
    return {"mean": state.mean, "var": state.var, "std": state.std}


def confidence_load_state_dict(state: ConfidenceState, d: dict) -> ConfidenceState:
    return state._replace(
        mean=jnp.asarray(d["mean"], jnp.float32).reshape(()),
        var=jnp.asarray(d["var"], jnp.float32).reshape(()),
        std=jnp.asarray(d["std"], jnp.float32).reshape(()),
    )

"""Confidence-weighted traversability / anomaly losses as pure functions.

Re-design of the reference's nn.Module losses
(/root/reference/wild_visual_navigation/utils/loss.py:16-164) for the
jitted train step: state (the confidence generator's statistics) goes
in and comes out explicitly; dynamic boolean indexing becomes masked
reductions with identical numerics.

TraversabilityLoss semantics (loss.py:93-160):
    loss_reco_i = mean_d (reco_i - x_i)^2                 per sample
    confidence  = CG.update(loss_reco, positives=y_valid) (no grad)
    loss_trav_i = (trav_i - y_i)^2         (or BCE)
    labeled     = y_valid;   unlabeled weighted by (1 - confidence)
    loss_trav   = (sum_labeled + sum_unlabeled*(1-conf)) / N
    loss        = w_trav * loss_trav + w_reco * mean_labeled(loss_reco)

AnomalyLoss (loss.py:16-54): flow NLL -mean(logprob.sum(-1)+log_det),
confidence generator fed the negated losses.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .confidence_generator import (
    ConfidenceConfig,
    ConfidenceState,
    confidence_inference,
    confidence_update,
)
from .data import TravBatch


@dataclass(frozen=True)
class TraversabilityLossConfig:
    w_trav: float = 0.03
    w_reco: float = 0.5
    w_temp: float = 0.0  # reference computes it as 0 (loss.py:143)
    anomaly_balanced: bool = True
    trav_cross_entropy: bool = False
    confidence: ConfidenceConfig = ConfidenceConfig()


def _masked_mean(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    mf = m.astype(v.dtype)
    return jnp.sum(v * mf) / jnp.maximum(jnp.sum(mf), 1.0)


def traversability_loss(
    cfg: TraversabilityLossConfig,
    batch: TravBatch,
    res: jnp.ndarray,
    cg_state: ConfidenceState,
    update_generator: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], ConfidenceState]:
    """Compute the loss on model output `res` (N, 1 + D).

    Returns (loss, aux dict incl. per-sample confidence, new CG state).
    Gradients do not flow through the confidence statistics (the
    reference wraps the update in no_grad, loss.py:105-114).
    """
    D = batch.x.shape[-1]
    reco = res[:, -D:]
    trav = res[:, 0]

    loss_reco = jnp.mean((reco - batch.x) ** 2, axis=-1)  # (N,)
    labeled = batch.y_valid & batch.sample_valid
    unlabeled = (~batch.y_valid) & batch.sample_valid

    loss_reco_ng = jax.lax.stop_gradient(loss_reco)
    if update_generator:
        cg_state, confidence = confidence_update(cfg.confidence, cg_state, loss_reco_ng, labeled)
    else:
        confidence = confidence_inference(cfg.confidence, cg_state, loss_reco_ng)
    confidence = jax.lax.stop_gradient(confidence)

    if cfg.trav_cross_entropy:
        eps = 1e-7
        p = jnp.clip(trav, eps, 1 - eps)
        loss_trav_raw = -(batch.y * jnp.log(p) + (1 - batch.y) * jnp.log(1 - p))
    else:
        loss_trav_raw = (trav - batch.y) ** 2

    n = jnp.maximum(jnp.sum(batch.sample_valid.astype(jnp.float32)), 1.0)
    if cfg.anomaly_balanced:
        s_labeled = jnp.sum(jnp.where(labeled, loss_trav_raw, 0.0))
        s_unlabeled = jnp.sum(jnp.where(unlabeled, loss_trav_raw * (1.0 - confidence), 0.0))
        loss_trav_confidence = (s_labeled + s_unlabeled) / n
    else:
        loss_trav_confidence = _masked_mean(loss_trav_raw, batch.sample_valid)

    loss_reco_mean = _masked_mean(loss_reco, labeled)
    loss_temp = jnp.zeros_like(loss_trav_confidence)
    loss = cfg.w_trav * loss_trav_confidence + cfg.w_reco * loss_reco_mean + cfg.w_temp * loss_temp

    aux = {
        "loss_reco": loss_reco_mean,
        "loss_trav": _masked_mean(loss_trav_raw, batch.sample_valid),
        "loss_temp": loss_temp,
        "loss_trav_confidence": loss_trav_confidence,
        "confidence": confidence,
    }
    return loss, aux, cg_state


@dataclass(frozen=True)
class AnomalyLossConfig:
    confidence: ConfidenceConfig = ConfidenceConfig()


def anomaly_loss(
    cfg: AnomalyLossConfig,
    res: Dict[str, jnp.ndarray],
    sample_valid: jnp.ndarray,
    cg_state: ConfidenceState,
    update_generator: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], ConfidenceState]:
    """Flow NLL + confidence update (reference loss.py:30-51).

    res: {"logprob": (N, D), "log_det": (N,)}; sample_valid: (N,) bool.
    """
    losses = jnp.sum(res["logprob"], axis=-1) + res["log_det"]  # (N,) log-likelihoods
    neg = jax.lax.stop_gradient(-losses)
    if update_generator:
        cg_state, confidence = confidence_update(cfg.confidence, cg_state, neg, sample_valid)
    else:
        confidence = confidence_inference(cfg.confidence, cg_state, neg)

    loss = -_masked_mean(losses, sample_valid)
    aux = {
        "loss_trav": jnp.zeros(()),
        "loss_reco": jnp.zeros(()),
        "confidence": confidence,
    }
    return loss, aux, cg_state


def reconstruction_confidence(
    cfg: ConfidenceConfig,
    cg_state: ConfidenceState,
    features: jnp.ndarray,
    reconstruction: jnp.ndarray,
) -> jnp.ndarray:
    """Per-sample confidence from reconstruction error without updating
    statistics — the inference-node path (reference
    loss.py:162-164 `update_node_confidence` and quick_start.py:210-212)."""
    loss_reco = jnp.mean((reconstruction - features) ** 2, axis=-1)
    return confidence_inference(cfg, cg_state, loss_reco)

"""Offline training routine over exported mission graphs.

Equivalent of the reference's offline-model-training mode
(.deprecated/general/training_routine.py:26 + lightning_module.py:15,
README.md:194): epochs of the confidence-weighted traversability loss
over a GraphTravDataset, validation ROC/AUC, best-checkpoint saving.
No Lightning — a jitted train step in a plain loop, logging through the
logger factory (utils/get_logger.py equivalent below).
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from ..models import apply_model, get_model, init_model
from ..utils.confidence_generator import confidence_init
from ..utils.data import TravBatch
from ..utils.loss import TraversabilityLossConfig, traversability_loss
from .dataset import GraphTravDataset
from .metrics import accuracy, auroc, optimal_threshold


@dataclass
class OfflineTrainerConfig:
    model_cfg: dict = field(default_factory=lambda: {
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": 384, "hidden_sizes": [256, 32, 1], "reconstruction": True},
    })
    lr: float = 1e-3
    epochs: int = 10
    batch_size: int = 8
    seed: int = 42
    loss_cfg: TraversabilityLossConfig = field(default_factory=TraversabilityLossConfig)
    output_folder: Optional[str] = None


class OfflineTrainer:
    def __init__(self, cfg: OfflineTrainerConfig):
        self.cfg = cfg
        self.model = get_model(cfg.model_cfg)
        D = self._input_size()
        self.params = init_model(self.model, jax.random.PRNGKey(cfg.seed), D)
        self.tx = optax.adam(cfg.lr)
        self.opt_state = self.tx.init(self.params)
        self.cg_state = confidence_init()
        self.step = 0
        self.threshold = 0.5
        self.history: list = []

        loss_cfg = cfg.loss_cfg
        model = self.model

        @jax.jit
        def _train_step(params, opt_state, cg_state, x, y, yv, sv):
            batch = TravBatch(x=x.reshape(-1, x.shape[-1]), y=y.reshape(-1),
                              y_valid=yv.reshape(-1), sample_valid=sv.reshape(-1))

            def lf(p):
                res = apply_model(model, p, batch.x)
                loss, aux, cg2 = traversability_loss(loss_cfg, batch, res, cg_state)
                return loss, cg2

            (loss, cg2), grads = jax.value_and_grad(lf, has_aux=True)(params)
            updates, opt2 = self.tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt2, cg2, loss

        @jax.jit
        def _predict(params, x):
            return apply_model(model, params, x.reshape(-1, x.shape[-1]))[:, 0]

        self._train_step = _train_step
        self._predict = _predict

    def _input_size(self) -> int:
        name = self.cfg.model_cfg["name"]
        snake = {"SimpleMLP": "simple_mlp_cfg", "DoubleMLP": "double_mlp_cfg",
                 "SimpleGCN": "simple_gcn_cfg", "LinearRnvp": "linear_rnvp_cfg"}[name]
        return self.cfg.model_cfg[snake]["input_size"]

    def fit(self, train: GraphTravDataset, val: Optional[GraphTravDataset] = None, logger=None) -> Dict:
        rng = np.random.RandomState(self.cfg.seed)
        best_auc, best_path = -1.0, None
        for epoch in range(self.cfg.epochs):
            losses = []
            for x, y, yv, sv in train.batches(self.cfg.batch_size, rng):
                self.params, self.opt_state, self.cg_state, loss = self._train_step(
                    self.params, self.opt_state, self.cg_state,
                    jnp.asarray(x), jnp.asarray(y), jnp.asarray(yv), jnp.asarray(sv),
                )
                self.step += 1
                losses.append(float(loss))
            row = {"epoch": epoch, "train_loss": float(np.mean(losses)) if losses else float("nan")}
            if val is not None and len(val):
                row.update(self.evaluate(val))
                if row["val_auroc"] > best_auc and self.cfg.output_folder:
                    best_auc = row["val_auroc"]
                    best_path = self.save(self.cfg.output_folder, "best.ckpt")
            self.history.append(row)
            if logger is not None:
                logger.log_metrics(row, step=self.step)
        out = dict(self.history[-1])
        out["best_checkpoint"] = best_path
        return out

    def evaluate(self, ds: GraphTravDataset) -> Dict:
        scores = np.asarray(self._predict(self.params, jnp.asarray(ds.features)))
        labels = (ds.signal.reshape(-1) > 0.5) & ds.signal_valid.reshape(-1)
        mask = ds.sample_valid.reshape(-1) & ds.signal_valid.reshape(-1)
        if mask.sum() < 2 or len(np.unique(labels[mask])) < 2:
            return {"val_auroc": float("nan"), "val_acc": float("nan")}
        s, l = scores[mask], labels[mask]
        self.threshold = optimal_threshold(s, l)
        return {"val_auroc": auroc(s, l), "val_acc": accuracy(s, l, self.threshold)}

    def save(self, folder: str, name: str = "offline.ckpt") -> str:
        os.makedirs(folder, exist_ok=True)
        path = os.path.join(folder, name)
        with open(path, "wb") as f:
            pickle.dump({
                "params": serialization.to_bytes(self.params),
                "cg_state": serialization.to_bytes(self.cg_state),
                "opt_state": serialization.to_bytes(self.opt_state),
                "step": self.step,
                "loss": self.history[-1]["train_loss"] if self.history else float("inf"),
                "threshold": self.threshold,
            }, f)
        return path

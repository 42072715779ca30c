"""Offline training stack + optical flow tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wild_visual_navigation_tpu.offline import (
    GraphTravDataset,
    OfflineTrainer,
    OfflineTrainerConfig,
    accuracy,
    auroc,
    get_logger,
    optimal_threshold,
)
from wild_visual_navigation_tpu.ops.optical_flow import dense_flow, track_points


def _make_export(folder, n=20, S=16, D=8, seed=0):
    """Synthetic mission export: separable grass/rock features."""
    rng = np.random.RandomState(seed)
    grass = rng.randn(D)
    rock = rng.randn(D) * 2
    os.makedirs(folder, exist_ok=True)
    for i in range(n):
        is_grass = rng.rand(S) < 0.5
        feats = np.where(is_grass[:, None], grass, rock) + rng.randn(S, D) * 0.1
        signal = np.where(is_grass, 0.9, 0.1)
        valid = np.ones(S, bool)
        np.savez_compressed(
            os.path.join(folder, f"graph_{i}.npz"),
            features=feats.astype(np.float32),
            signal=signal.astype(np.float32),
            signal_valid=valid,
            segments=np.zeros((4, 4), np.int32),
        )


def test_metrics():
    scores = np.array([0.9, 0.8, 0.3, 0.2])
    labels = np.array([True, True, False, False])
    assert auroc(scores, labels) == 1.0
    assert accuracy(scores, labels, 0.5) == 1.0
    t = optimal_threshold(scores, labels)
    assert 0.3 < t <= 0.8


def test_offline_trainer_learns(tmp_path):
    export = str(tmp_path / "export")
    _make_export(export)
    train = GraphTravDataset.from_folder(export, mode="train")
    val = GraphTravDataset.from_folder(export, mode="val")
    assert len(train) == 16 and len(val) == 4

    cfg = OfflineTrainerConfig(
        model_cfg={"name": "SimpleMLP", "simple_mlp_cfg": {"input_size": 8, "hidden_sizes": [16, 1], "reconstruction": True}},
        epochs=40,
        batch_size=4,
        output_folder=str(tmp_path / "out"),
    )
    trainer = OfflineTrainer(cfg)
    logger = get_logger("csv", str(tmp_path / "logs"))
    result = trainer.fit(train, val, logger=logger)
    assert result["val_auroc"] > 0.95
    assert result["best_checkpoint"] is not None and os.path.exists(result["best_checkpoint"])
    assert os.path.exists(os.path.join(str(tmp_path / "logs"), "metrics.csv"))
    # and the checkpoint is loadable by quick_start's format expectations
    import pickle

    with open(result["best_checkpoint"], "rb") as f:
        payload = pickle.load(f)
    assert "params" in payload and "cg_state" in payload


def test_logger_registry(tmp_path):
    with pytest.raises(ValueError):
        get_logger("nope", str(tmp_path))
    lg = get_logger("tensorboard", str(tmp_path / "tb"))
    lg.log_metrics({"loss": 1.0}, step=0)
    lg.finalize()


# --------------------------------------------------------------- optical flow


def _textured(h=96, w=96, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.rand(h // 8, w // 8).astype(np.float32)
    img = img.repeat(8, 0).repeat(8, 1)
    for _ in range(2):
        img = 0.25 * (np.roll(img, 1, 0) + np.roll(img, -1, 0) + np.roll(img, 1, 1) + np.roll(img, -1, 1))
    return img


def test_track_points_known_shift():
    img = _textured()
    shift = 3
    img2 = np.roll(img, (shift, shift), axis=(0, 1))
    pts = jnp.asarray([[40.0, 40.0], [56.0, 48.0], [30.0, 60.0]])
    new_pts, valid = track_points(jnp.asarray(img), jnp.asarray(img2), pts, levels=3, window=15, iters=10)
    assert bool(valid.all())
    flow = np.asarray(new_pts - pts)
    np.testing.assert_allclose(flow, shift, atol=0.35)


def test_dense_flow_shapes():
    img = _textured()
    img2 = np.roll(img, 2, axis=1)
    pts, flow, valid = dense_flow(jnp.asarray(img), jnp.asarray(img2), stride=16)
    assert pts.shape == flow.shape
    f = np.asarray(flow)[np.asarray(valid)]
    # median flow matches the true (2, 0) shift
    assert abs(np.median(f[:, 0]) - 2) < 0.5
    assert abs(np.median(f[:, 1])) < 0.5


def test_online_export_feeds_offline_trainer(tmp_path):
    """The full round trip the reference's deprecated offline mode
    relies on: ONLINE replay session -> TraversabilityEstimator
    .save_graph export -> GraphTravDataset -> OfflineTrainer. The
    online export format must feed the offline stack unmodified."""
    import jax

    from wild_visual_navigation_tpu.cfg import (
        ExperimentParams,
        FeatureExtractorNodeParams,
        LearningNodeParams,
    )
    from wild_visual_navigation_tpu.runtime import WVNRuntime, run_replay, synthetic_sequence

    fe = FeatureExtractorNodeParams(
        network_input_image_height=48, network_input_image_width=48,
        segmentation_type="grid", feature_type="sift", prediction_per_pixel=False,
        image_callback_rate=1000.0, grid_cell_size=8,
    )
    ln = LearningNodeParams(
        network_input_image_height=48, network_input_image_width=48,
        image_graph_dist_thr=0.1, supervision_graph_dist_thr=0.05,
        min_samples_for_training=3, supervision_callback_rate=1000.0,
    )
    rt = WVNRuntime(fe_params=fe, ln_params=ln, key=jax.random.PRNGKey(0),
                    buffer_capacity=32, reprojection_fanout=8)
    seq = synthetic_sequence(duration=6.0, frame_rate=5.0, state_rate=5.0,
                             image_size=48, seed=2, obstacle_x=3.0)
    run_replay(rt, seq, train_every_state=1)

    export = str(tmp_path / "mission")
    rt.estimator.save_graph(export)
    train = GraphTravDataset.from_folder(export, mode="train")
    assert len(train) >= 4, "online session exported too few valid nodes"
    D = train.features.shape[-1]
    # the export carries feat_valid so offline sample masking matches
    # the online trainer (padded segment rows must not enter the loss)
    import glob

    import numpy as _np

    files = sorted(glob.glob(os.path.join(export, "graph_*.npz")))
    d0 = _np.load(files[0])
    assert "feat_valid" in d0.files
    if not bool(d0["feat_valid"].all()):
        assert not bool(train.sample_valid.all())

    cfg = OfflineTrainerConfig(
        model_cfg={"name": "SimpleMLP",
                   "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [16, 1], "reconstruction": True}},
        epochs=10, batch_size=2, output_folder=str(tmp_path / "out"),
    )
    trainer = OfflineTrainer(cfg)
    val = GraphTravDataset.from_folder(export, mode="val")
    result = trainer.fit(train, val if len(val) else train)
    assert result["best_checkpoint"] is not None and os.path.exists(result["best_checkpoint"])


def test_shuffled_labels_control(tmp_path):
    """GraphTravDataset.shuffled_labels breaks the feature<->label
    association (control floor for the ablation sweep) while keeping
    the label marginal; a model trained on it must NOT beat the model
    trained on real labels."""
    from dataclasses import replace

    export = str(tmp_path / "export")
    _make_export(export)
    train = GraphTravDataset.from_folder(export, mode="train")
    val = GraphTravDataset.from_folder(export, mode="val")
    shuf = train.shuffled_labels(seed=1)
    # marginal preserved, association broken
    assert np.isclose(shuf.signal.mean(), train.signal.mean())
    assert shuf.signal_valid.sum() == train.signal_valid.sum()
    assert not np.array_equal(shuf.signal, train.signal)

    cfg = OfflineTrainerConfig(
        model_cfg={"name": "SimpleMLP", "simple_mlp_cfg": {"input_size": 8, "hidden_sizes": [16, 1], "reconstruction": True}},
        epochs=30,
    )
    cfg.loss_cfg = replace(cfg.loss_cfg, w_reco=0.0, anomaly_balanced=False)
    real = OfflineTrainer(cfg).fit(train, val)
    control = OfflineTrainer(cfg).fit(shuf, val)
    assert real["val_auroc"] > 0.9
    assert real["val_auroc"] > control["val_auroc"] + 0.2


@pytest.mark.slow
def test_ablation_harness_torchvision_beats_control(tmp_path):
    """Regression for the round-3 below-chance grid:torchvision row
    (val AUROC 0.2498): the sweep's offline stage now runs the
    reference's feature-ablation loss config (w_reco=0,
    anomaly_balanced=False) and must beat its label-shuffle control."""
    import csv
    import subprocess
    import sys as _sys

    script = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tools", "ablation_sweep.py")
    res = subprocess.run(
        [_sys.executable, script, "--combos", "grid:torchvision", "--duration", "8",
         "--size", "64", "--epochs", "40", "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    with open(tmp_path / "ablation_results.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1 and not rows[0].get("error")
    val_auroc = float(rows[0]["val_auroc"])
    control = float(rows[0]["control_auroc"])
    assert val_auroc > 0.8, f"torchvision row regressed: {rows[0]}"
    assert val_auroc > control + 0.2, f"does not beat shuffle control: {rows[0]}"


def test_param_search_trial0_matches_sequential_trainer():
    """tools/param_search.py's vmapped population must be numerically
    the SAME training as OfflineTrainer run sequentially: trial 0 is
    pinned to the production defaults (lr 1e-3, w_trav 0.03, w_reco
    0.5, anomaly_balanced True), shares its init key (PRNGKey(seed)),
    its optax.adam chain (scale_by_adam + scale(-lr)), and its batch
    shuffle stream (RandomState(seed)) — so the final val scores must
    agree to fp32 tolerance. Also: the search must beat the default on
    separable synthetic data (the whole point of sweeping)."""
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))
    from tools.param_search import evaluate_population, make_synth, population_fit, sample_space
    from wild_visual_navigation_tpu.offline.trainer import OfflineTrainer, OfflineTrainerConfig

    train, val = make_synth(n_nodes=24, n_seg=4, dim=12, seed=3)
    lr, wt, wr = sample_space(6, seed=42)
    scores, losses, _ = population_fit(
        train, val, lr, wt, wr, epochs=8, batch_size=4, seed=42, anomaly_balanced=True,
    )

    cfg = OfflineTrainerConfig(epochs=8, batch_size=4, seed=42)
    cfg.model_cfg["simple_mlp_cfg"]["input_size"] = 12
    trainer = OfflineTrainer(cfg)
    trainer.fit(train)
    seq = np.asarray(trainer._predict(trainer.params, jnp.asarray(val.features)))
    np.testing.assert_allclose(scores[0], seq, rtol=2e-3, atol=2e-4)

    metrics = evaluate_population(scores, val)
    aurocs = [m["val_auroc"] for m in metrics]
    assert max(aurocs) >= aurocs[0] - 1e-9  # best never loses to the default
    assert max(aurocs) > 0.8, aurocs  # separable data: the sweep finds a working config

"""Validation on the reference's REAL recorded mission data.

The reference ships one real-world fixture under zero egress:
`/root/reference/assets/graph/` — 100 real STEGO segments from a
recorded forest mission (features, footprint labels, adjacency,
centers, camera image) plus the reference model's own stored
predictions on that exact graph (trav_pred.pt / reco_pred.pt — the
visualizer demo fixture, reference visu/visualizer.py:662-760).

These tests train the framework's offline and online paths on the real
features/labels and compare against the reference's stored predictions
on IDENTICAL data with an IDENTICAL metric. A label-shuffle control
pins that the learned separation comes from the labels.  Committed
artifact: results/real_data/real_data_results.{csv,md} (regenerate with
tools/real_data_eval.py).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wild_visual_navigation_tpu.offline.metrics import auroc
from wild_visual_navigation_tpu.offline.reference_graph import (
    available,
    load_reference_graph,
    reference_confidence,
)

pytestmark = pytest.mark.skipif(
    not available(), reason="reference graph assets not present"
)


@pytest.fixture(scope="module")
def ref():
    return load_reference_graph()


def test_loader_shapes_and_contract(ref):
    S, D = ref.x.shape
    assert (S, D) == (100, 90)  # 100 segments x STEGO feature dim
    assert ref.edge_index.shape[0] == 2
    assert ref.edge_index.max() < S and ref.edge_index.min() >= 0
    assert ref.y.shape == (S,) and ref.y_valid.shape == (S,)
    assert ref.trav_pred.shape == (S,)
    assert ref.reco_pred.shape == (S, D)
    assert ref.centers.shape == (S, 2)
    assert ref.img.shape == (448, 448, 3)
    # footprint-labeled segments are exactly the positive ones in this
    # mission (the robot walked there)
    assert np.array_equal(ref.y > 0.5, ref.y_valid)
    assert 0 < ref.y_valid.sum() < S
    # centers live inside the image
    assert (ref.centers >= 0).all()
    assert (ref.centers[:, 0] < 448).all() and (ref.centers[:, 1] < 448).all()
    # predictions are probabilities
    assert 0.0 <= ref.trav_pred.min() and ref.trav_pred.max() <= 1.0


def test_reference_stored_predictions_auroc(ref):
    """Pin the reference model's own quality on its own mission graph —
    the same-data number the framework has to beat."""
    labels = ref.y > 0.5
    a = auroc(ref.trav_pred, labels)
    assert a == pytest.approx(0.9167, abs=1e-3)
    conf = reference_confidence(ref.reco_pred, ref.x)
    assert conf.min() >= 0.0 and conf.max() <= 1.0
    assert auroc(conf, labels) == pytest.approx(0.9204, abs=1e-3)


@pytest.mark.slow
def test_offline_training_beats_reference_and_shuffle_control(ref):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from real_data_eval import train_offline

    labels = ref.y > 0.5
    _, score = train_offline(ref.x, ref.y, ref.y_valid, epochs=40)
    a = auroc(score(ref.x), labels)
    # reference stored trav_pred scores 0.9167 on this data
    assert a > 0.95, f"real-data AUROC {a} does not beat the reference's 0.9167"

    # label-shuffle control: same trainer, permuted labels -> ~chance
    perm = np.random.RandomState(123).permutation(ref.num_segments)
    _, score_sh = train_offline(ref.x, ref.y[perm], ref.y_valid[perm], epochs=40, seed=1)
    assert auroc(score_sh(ref.x), labels) < 0.75, "shuffled-label control should collapse to ~chance"


@pytest.mark.slow
def test_online_estimator_learns_real_data(ref):
    """The real segments through TraversabilityEstimator's jitted
    buffer-insert -> sample -> fused-train-step path."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from real_data_eval import train_online

    est, score_on, losses = train_online(ref.x, ref.y, ref.y_valid, steps=250)
    labels = ref.y > 0.5
    assert est.step >= 200
    assert losses[-1] < 0.3 * losses[0], "online loss did not decrease on real data"
    a = auroc(score_on(ref.x), labels)
    assert a > 0.95, f"online-trained AUROC {a} below the reference's stored 0.9167"


def test_visualizer_goldens_match_committed(ref, tmp_path):
    """The graph renders from the stored reference predictions must
    match the committed goldens (assets/goldens/reference_graph/)."""
    from PIL import Image

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from real_data_eval import render_goldens

    golden_dir = os.path.join(os.path.dirname(__file__), "..", "assets", "goldens", "reference_graph")
    renders = render_goldens(ref, str(tmp_path))
    for tag, arr in renders.items():
        g = np.asarray(Image.open(os.path.join(golden_dir, f"{tag}.png"))).astype(np.float32) / 255.0
        assert g.shape == arr.shape
        # identical rendering path; allow 8-bit quantization slack only
        assert np.abs(g - arr).max() <= (1.5 / 255.0), f"{tag} drifted from golden"

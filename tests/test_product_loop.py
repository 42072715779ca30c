"""Full product-loop and regression tests.

1. The complete lifecycle the reference supports end-to-end:
   online replay session -> mission-graph export -> offline training on
   the export -> checkpoint -> offline inference (quick_start path)
   with improved predictions. This is the deterministic e2e regression
   tier SURVEY §4 calls out as missing in the reference.
2. Numeric goldens for the geometry core (generated once with seed 0,
   asserted within tolerance) to catch silent numerical drift.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from wild_visual_navigation_tpu.cfg import (
    ExperimentParams,
    FeatureExtractorNodeParams,
    LearningNodeParams,
)
from wild_visual_navigation_tpu.offline import GraphTravDataset, OfflineTrainer, OfflineTrainerConfig
from wild_visual_navigation_tpu.runtime import WVNRuntime, run_replay, synthetic_sequence
from wild_visual_navigation_tpu.utils.operation_modes import WVNMode


def test_full_product_loop(tmp_path):
    # --- 1. online session on a synthetic replay
    fe = FeatureExtractorNodeParams(
        network_input_image_height=48, network_input_image_width=48,
        segmentation_type="grid", feature_type="sift", prediction_per_pixel=False,
        image_callback_rate=100.0,
    )
    ln = LearningNodeParams(
        network_input_image_height=48, network_input_image_width=48,
        image_graph_dist_thr=0.05, supervision_graph_dist_thr=0.02,
        min_samples_for_training=3, supervision_callback_rate=100.0,
        robot_width=0.5, robot_length=0.5,
    )
    exp = ExperimentParams()
    exp.model.simple_mlp_cfg.hidden_sizes = [16, 1]
    rt = WVNRuntime(fe_params=fe, ln_params=ln, exp_params=exp, key=jax.random.PRNGKey(0),
                    buffer_capacity=32, reprojection_fanout=8)
    seq = synthetic_sequence(duration=5.0, frame_rate=5.0, state_rate=5.0, image_size=48, seed=0)
    report = run_replay(rt, seq)
    assert report.valid_nodes >= 5

    # --- 2. mission-graph export (reference dataset export surface)
    export = str(tmp_path / "mission")
    rt.estimator.save_graph(export)
    files = os.listdir(export)
    assert len(files) >= 5

    # --- 3. offline training on the export
    train = GraphTravDataset.from_folder(export, mode="train", percentage=1.0)
    D = train.features.shape[-1]
    trainer = OfflineTrainer(OfflineTrainerConfig(
        model_cfg={"name": "SimpleMLP", "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [16, 1], "reconstruction": True}},
        epochs=80, lr=3e-3, batch_size=4, output_folder=str(tmp_path / "out"),
    ))
    trainer.fit(train)
    ckpt = trainer.save(str(tmp_path / "out"), "offline.ckpt")

    # --- 4. the offline checkpoint drives inference (quick_start path)
    import pickle

    from flax import serialization
    from wild_visual_navigation_tpu.models import get_model
    from wild_visual_navigation_tpu.utils import ConfidenceConfig, confidence_init, reconstruction_confidence

    model = get_model({"name": "SimpleMLP", "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [16, 1], "reconstruction": True}})
    params = model.init(jax.random.PRNGKey(9), jnp.zeros((1, D)))
    cg = confidence_init()
    with open(ckpt, "rb") as f:
        payload = pickle.load(f)
    params = serialization.from_bytes(params, payload["params"])
    cg = serialization.from_bytes(cg, payload["cg_state"])

    # supervised (traversed) features should now score high
    sv = train.signal_valid & (train.signal > 0.5)
    feats = train.features[sv]
    assert feats.shape[0] > 10
    scores = np.asarray(model.apply(params, jnp.asarray(feats))[:, 0])
    assert scores.mean() > 0.6, f"offline-trained model scores traversed terrain at {scores.mean():.2f}"
    conf = reconstruction_confidence(
        ConfidenceConfig(), cg, jnp.asarray(feats), model.apply(params, jnp.asarray(feats))[:, 1:]
    )
    assert float(jnp.mean(conf)) > 0.3


def test_extract_labels_mode(tmp_path):
    """EXTRACT_LABELS exports supervision masks per node (reference
    traversability_estimator.py:291-300)."""
    from tests.test_traversability_estimator import _add_mission, _make_estimator, _pose
    from wild_visual_navigation_tpu.traversability import SupervisionNode

    est = _make_estimator(mode=WVNMode.EXTRACT_LABELS, extraction_store_folder=str(tmp_path))
    key = jax.random.PRNGKey(0)
    for i, x in enumerate(np.linspace(0, 0.6, 4)):
        _add_mission(est, float(i), float(x), jax.random.fold_in(key, i))
    for i, x in enumerate(np.linspace(0, 0.6, 5)):
        sn = SupervisionNode(
            timestamp=float(i) + 0.5, pose_base_in_world=_pose(float(x)), width=0.4, length=0.4, height=0.3,
            twist_in_base=np.array([1.0, 0, 0]), desired_twist_in_base=np.array([1.0, 0, 0]),
            traversability=0.8, traversability_var=1.0, is_untraversable=False,
        )
        est.add_supervision_node(sn)
    masks = os.listdir(os.path.join(str(tmp_path), "supervision_mask"))
    assert len(masks) >= 3
    m = np.load(os.path.join(str(tmp_path), "supervision_mask", masks[0]))
    assert m.dtype == bool


# ----------------------------------------------------------- geometry goldens

# Generated with the implementations at seed 0; tolerances catch silent
# numerical drift (e.g. a precision regression in the lie/projection core).
_GOLDEN_SE3_LOG = np.array([0.22, -0.66, 0.55, -0.55, 0.11, 0.44], np.float32)  # = 1.1 * xi


def test_golden_se3_log():
    from wild_visual_navigation_tpu.utils import lie

    xi = jnp.asarray([0.2, -0.6, 0.5, -0.5, 0.1, 0.4])
    # perturb through exp/log once: fixed, deterministic
    T = lie.se3_exp(xi)
    T2 = T @ lie.se3_exp(xi * 0.1)
    out = np.asarray(lie.se3_log(T2 @ jnp.linalg.inv(T) @ T) )
    # golden: log of T2 (= xi composed with 0.1 xi)
    np.testing.assert_allclose(out, _GOLDEN_SE3_LOG, atol=2e-4)


def test_golden_projection():
    from wild_visual_navigation_tpu.ops import projection

    K = jnp.asarray([[100.0, 0, 80], [0, 100.0, 60], [0, 0, 1]])[None]
    cam = projection.Camera(K=K, height=120, width=160)
    pose = jnp.eye(4)[None]
    pts = jnp.asarray([[[0.3, -0.2, 2.0], [-0.5, 0.1, 4.0]]])
    p2d, valid, _ = projection.project_points(cam, pose, pts)
    np.testing.assert_allclose(np.asarray(p2d[0]), [[95.0, 50.0], [67.5, 62.5]], atol=1e-4)
    assert bool(valid.all())

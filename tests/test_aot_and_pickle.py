"""AOT engine + whole-estimator pickle tests."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from wild_visual_navigation_tpu.feature_extractor.aot_engine import (
    AOTEngine,
    load_engine_spec,
    save_engine_spec,
)
from wild_visual_navigation_tpu.models import get_model


def _mlp_and_params(D=16):
    m = get_model({"name": "SimpleMLP", "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [32, 1], "reconstruction": True}})
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, D)))
    return m, p


def test_aot_engine_executes_and_checks_shapes():
    m, p = _mlp_and_params()
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
    eng = AOTEngine(lambda params, x: m.apply(params, x), p, x)
    out = eng(x)
    ref = m.apply(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    try:
        eng(jnp.zeros((4, 16)))
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_engine_spec_roundtrip(tmp_path):
    m, p = _mlp_and_params()
    path = str(tmp_path / "engine.spec")
    save_engine_spec(path, p, (8, 16), "float32", {"model": "SimpleMLP"})
    p2, shape, dtype, meta = load_engine_spec(path, p)
    assert shape == (8, 16) and meta["model"] == "SimpleMLP"
    for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_estimator_whole_pickle(tmp_path):
    from tests.test_traversability_estimator import _add_mission, _make_estimator, _pose
    from wild_visual_navigation_tpu.traversability import SupervisionNode, TraversabilityEstimator

    est = _make_estimator()
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
    for _ in range(3):
        est.train()
    step0 = est.step

    path = est.save_pickle(str(tmp_path / "estimator.pkl"))
    est2 = TraversabilityEstimator.load_pickle(path)
    assert est2.step == step0
    assert est2.get_num_valid_nodes() == est.get_num_valid_nodes()
    np.testing.assert_array_equal(np.asarray(est2.buffer.signal), np.asarray(est.buffer.signal))
    # the restored estimator can keep training
    out = est2.train()
    assert out.get("loss_total", -1) > 0
    assert est2.step == step0 + 1


def test_orbax_checkpoint_roundtrip(tmp_path):
    from tests.test_traversability_estimator import _add_mission, _make_estimator, _pose
    from wild_visual_navigation_tpu.traversability import SupervisionNode

    est = _make_estimator()
    key = jax.random.PRNGKey(5)
    for i, x in enumerate(np.linspace(0, 0.6, 4)):
        _add_mission(est, float(i), float(x), jax.random.fold_in(key, i))
    for i, x in enumerate(np.linspace(0, 0.6, 5)):
        sn = SupervisionNode(
            timestamp=float(i) + 0.5, pose_base_in_world=_pose(float(x)), width=0.4, length=0.4, height=0.3,
            twist_in_base=np.array([1.0, 0, 0]), desired_twist_in_base=np.array([1.0, 0, 0]),
            traversability=0.8, traversability_var=1.0, is_untraversable=False,
        )
        est.add_supervision_node(sn)
    for _ in range(3):
        est.train()
    path = est.save_checkpoint_orbax(str(tmp_path))
    step0 = est.step

    est2 = _make_estimator()
    est2.load_checkpoint_orbax(path)
    assert est2.step == step0
    for a, b in zip(jax.tree_util.tree_leaves(est.params), jax.tree_util.tree_leaves(est2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_confidence_sample_logging(tmp_path):
    from tests.test_traversability_estimator import _add_mission, _make_estimator, _pose
    from wild_visual_navigation_tpu.traversability import SupervisionNode

    est = _make_estimator(log_confidence_folder=str(tmp_path / "cg"), log_every=2)
    key = jax.random.PRNGKey(6)
    for i, x in enumerate(np.linspace(0, 0.6, 4)):
        _add_mission(est, float(i), float(x), jax.random.fold_in(key, i))
    for i, x in enumerate(np.linspace(0, 0.6, 5)):
        sn = SupervisionNode(
            timestamp=float(i) + 0.5, pose_base_in_world=_pose(float(x)), width=0.4, length=0.4, height=0.3,
            twist_in_base=np.array([1.0, 0, 0]), desired_twist_in_base=np.array([1.0, 0, 0]),
            traversability=0.8, traversability_var=1.0, is_untraversable=False,
        )
        est.add_supervision_node(sn)
    for _ in range(6):
        est.train()
    import os

    files = os.listdir(str(tmp_path / "cg"))
    assert len(files) >= 2
    d = np.load(str(tmp_path / "cg" / sorted(files)[0]))
    assert "mean" in d and "std" in d

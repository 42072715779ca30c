"""Failure-detection / recovery parity (VERDICT r1 #8).

The reference keeps a `_system_events` journal updated by every
callback (wvn_learning_node.py:446-457, 540-548, 681-688), contains
per-callback exceptions so one bad frame doesn't kill the node
(wvn_feature_extractor_node.py:395-402), and persists a final
checkpoint on SIGINT/SIGTERM (wvn_learning_node.py:148-174). The
two-node topology must survive an inference-node restart by rejoining
via the hot-swap file (wvn_feature_extractor_node.py:407-450).
"""

import os
import pickle
import signal
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from wild_visual_navigation_tpu.cfg import FeatureExtractorNodeParams, LearningNodeParams
from wild_visual_navigation_tpu.runtime.runtime import WVNRuntime
from wild_visual_navigation_tpu.runtime.status import SystemEvents


def _tiny_runtime(**kw):
    fe = FeatureExtractorNodeParams(
        network_input_image_height=32,
        network_input_image_width=32,
        segmentation_type="grid",
        feature_type="dino",
        dino_backbone="vit_small",
        dino_patch_size=8,
        camera_topics={"cam": {"use_for_training": True}},
    )
    fe.grid_cell_size = 8
    ln = LearningNodeParams(min_samples_for_training=1)
    return WVNRuntime(fe_params=fe, ln_params=ln, buffer_capacity=8,
                      reprojection_fanout=4, use_fused=False, **kw)


def test_system_events_journal():
    ev = SystemEvents(max_errors=2)
    ev.record("image_callback_received")
    ev.record("image_callback_canceled", "canceled due to rate")
    try:
        raise ValueError("boom")
    except ValueError as e:
        ev.record_error("image_callback_state", e)
    snap = ev.snapshot()
    assert snap["events"]["image_callback_received"]["value"] == "message received"
    assert "rate" in snap["events"]["image_callback_canceled"]["value"]
    assert "boom" in snap["events"]["image_callback_state"]["value"]
    assert len(snap["errors"]) == 1 and "ValueError" in snap["errors"][0]["traceback"]
    # ring is bounded
    for i in range(5):
        try:
            raise RuntimeError(f"e{i}")
        except RuntimeError as e:
            ev.record_error("x", e)
    assert len(ev.snapshot()["errors"]) == 2


def test_runtime_journals_and_contains_callback_errors():
    rt = _tiny_runtime(swallow_callback_errors=True)
    img = np.random.RandomState(0).rand(3, 40, 40).astype(np.float32)
    K = np.array([[30.0, 0, 20], [0, 30, 20], [0, 0, 1]])
    out = rt.image_callback(img, 0.0, "cam", K, 40, 40, np.eye(4), np.eye(4))
    assert out is not None
    assert "image_callback_received" in rt.events.snapshot()["events"]

    # rate-gated second frame journals a cancel
    rt.image_callback(img, 0.001, "cam", K, 40, 40, np.eye(4), np.eye(4))
    assert "image_callback_canceled" in rt.events.snapshot()["events"]

    # a poisoned frame (1-D "image") is contained, journaled, node alive
    bad = rt.image_callback(np.zeros((3,), np.float32), 10.0, "cam", K, 40, 40, np.eye(4), np.eye(4))
    assert bad is None
    snap = rt.events.snapshot()
    assert len(snap["errors"]) >= 1
    # and the next good frame still works
    out = rt.image_callback(img, 20.0, "cam", K, 40, 40, np.eye(4), np.eye(4))
    assert out is not None


def test_runtime_raises_without_swallow():
    rt = _tiny_runtime(swallow_callback_errors=False)
    K = np.array([[30.0, 0, 20], [0, 30, 20], [0, 0, 1]])
    with pytest.raises(Exception):
        rt.image_callback(np.zeros((3,), np.float32), 0.0, "cam", K, 40, 40, np.eye(4), np.eye(4))
    assert len(rt.events.snapshot()["errors"]) == 1


def test_shutdown_persists_checkpoint_and_events(tmp_path):
    rt = _tiny_runtime()
    img = np.random.RandomState(0).rand(3, 40, 40).astype(np.float32)
    K = np.array([[30.0, 0, 20], [0, 30, 20], [0, 0, 1]])
    rt.image_callback(img, 0.0, "cam", K, 40, 40, np.eye(4), np.eye(4))
    path = rt.shutdown(str(tmp_path))
    assert path is not None and os.path.exists(path)
    with open(path, "rb") as f:
        payload = pickle.load(f)
    assert {"params", "opt_state", "cg_state", "step"} <= set(payload)
    assert os.path.exists(tmp_path / "system_events.json")


def test_sigterm_persists_checkpoint(tmp_path):
    """Real signal delivery in a subprocess: SIGTERM must leave a final
    checkpoint behind (reference wvn_learning_node.py:148-174)."""
    script = textwrap.dedent(f"""
        import os, signal, sys
        sys.path.insert(0, {repr(os.getcwd())})
        import jax
        jax.config.update("jax_platforms", "cpu")
        from tests.test_failure_handling import _tiny_runtime
        rt = _tiny_runtime()
        rt.install_signal_handlers({repr(str(tmp_path))})
        os.kill(os.getpid(), signal.SIGTERM)
    """)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    res = subprocess.run([sys.executable, "-c", script], env=env, cwd=os.getcwd(),
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == -signal.SIGTERM, res.stderr
    assert os.path.exists(tmp_path / "last_checkpoint.ckpt")
    assert os.path.exists(tmp_path / "system_events.json")


def test_two_node_inference_restart_rejoins(tmp_path):
    """Kill and restart the inference node: the fresh node must pick up
    the learner's latest weights from the hot-swap file."""
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.cfg import ExperimentParams
    from wild_visual_navigation_tpu.runtime.nodes import FeatureExtractorNode, LearningNode
    from wild_visual_navigation_tpu.traversability import MissionNode

    folder = str(tmp_path / "mission")
    fe_params = FeatureExtractorNodeParams(
        network_input_image_height=32,
        network_input_image_width=32,
        segmentation_type="grid",
        feature_type="dino",
        dino_backbone="vit_small",
        dino_patch_size=8,
        camera_topics={"cam": {"use_for_training": True}},
    )
    fe_params.grid_cell_size = 8
    ln = LearningNode(
        fe_params=fe_params,
        ln_params=LearningNodeParams(min_samples_for_training=1),
        hot_swap_folder=folder,
    )
    est = ln.runtime.estimator

    # feed the learner directly so training can run
    rng = np.random.RandomState(0)
    S = ln.runtime._S
    D = ln.runtime._D
    K = np.array([[30.0, 0, 16], [0, 30, 16], [0, 0, 1]], dtype=np.float32)
    seg = (np.arange(32 * 32) % S).reshape(32, 32)
    Tc = np.eye(4)
    Tc[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]])
    Tc[2, 3] = 2.0
    for i in range(6):
        T = np.eye(4)
        T[0, 3] = i * 0.3
        node = MissionNode(timestamp=float(i), pose_base_in_world=T,
                           pose_cam_in_base=np.linalg.inv(T) @ (T @ Tc))
        est.add_mission_node(node, jnp.asarray(rng.rand(S, D), jnp.float32),
                             jnp.ones(S, bool), jnp.asarray(seg), jnp.asarray(K))
        ln.robot_state_callback(float(i) + 0.01, T, np.array([1.0, 0, 0]), np.array([1.0, 0, 0]))
    for _ in range(12):
        ln.learning_step()
    assert est.step > 0

    node1 = FeatureExtractorNode(params=fe_params, hot_swap_folder=folder)
    assert node1.maybe_reload_weights()
    step_before = node1._loaded_step
    assert step_before > 0

    # learner keeps training; inference node "crashes" (dropped)
    del node1
    for _ in range(12):
        ln.learning_step()
    ln.shutdown(str(tmp_path / "ckpts"))

    # restarted node rejoins at the learner's LATEST weights
    node2 = FeatureExtractorNode(params=fe_params, hot_swap_folder=folder)
    assert node2.maybe_reload_weights()
    assert node2._loaded_step >= step_before
    ref = np.asarray(ln.runtime.estimator.params["params"]["Dense_0"]["kernel"])
    got = np.asarray(node2.model_params["params"]["Dense_0"]["kernel"])
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_signal_mid_critical_section_defers_shutdown(tmp_path):
    """A SIGTERM landing while the main thread holds the estimator lock
    must NOT run shutdown re-entrantly (the RLock would let it operate
    on a possibly-donated buffer); it defers, and the next callback
    epilogue persists the checkpoint and re-raises the signal."""
    script = textwrap.dedent(f"""
        import os, signal, sys
        sys.path.insert(0, {repr(os.getcwd())})
        import jax
        jax.config.update("jax_platforms", "cpu")
        import numpy as np
        from tests.test_failure_handling import _tiny_runtime
        rt = _tiny_runtime()
        rt.install_signal_handlers({repr(str(tmp_path))})
        # signal arrives while the estimator lock is held
        with rt.estimator.lock:
            os.kill(os.getpid(), signal.SIGTERM)
            assert rt._deferred_shutdown is not None, "handler did not defer"
            assert not os.path.exists(os.path.join({repr(str(tmp_path))}, "last_checkpoint.ckpt")), \\
                "shutdown ran inside the critical section"
        # the next callback completes the deferred shutdown + re-raise
        img = np.random.RandomState(0).rand(3, 40, 40).astype(np.float32)
        K = np.array([[30.0, 0, 20], [0, 30, 20], [0, 0, 1.0]])
        rt.image_callback(img, 0.0, "cam", K, 40, 40, np.eye(4), np.eye(4))
        print("UNREACHABLE")  # the epilogue re-raises SIGTERM
    """)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    res = subprocess.run([sys.executable, "-c", script], env=env, cwd=os.getcwd(),
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == -signal.SIGTERM, (res.returncode, res.stderr[-2000:])
    assert "UNREACHABLE" not in res.stdout
    assert os.path.exists(tmp_path / "last_checkpoint.ckpt"), "deferred shutdown never persisted"

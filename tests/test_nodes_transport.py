"""Two-process-topology tests: message codecs, socket transport, and the
full FeatureExtractorNode -> LearningNode loop with hot-swap through the
filesystem (the reference's deployment shape, driven in-process)."""

import os
import threading
import time

import jax
import numpy as np
import pytest

from wild_visual_navigation_tpu.cfg import (
    ExperimentParams,
    FeatureExtractorNodeParams,
    LearningNodeParams,
)
from wild_visual_navigation_tpu.runtime.msgs import ImageFeatures, SystemStateMsg
from wild_visual_navigation_tpu.runtime.nodes import (
    FeatureExtractorNode,
    LearningNode,
    read_hot_swap_state,
    write_hot_swap_state,
)
from wild_visual_navigation_tpu.runtime.transport import LocalTopic, SocketPublisher, SocketSubscriber
from wild_visual_navigation_tpu.runtime.converters import (
    anymal_state_to_robot_state,
    camera_info_to_K,
    jackal_state_to_robot_state,
    policy_debug_info_to_twist,
    pose7_to_se3,
    se3_to_pose7,
)


def test_image_features_roundtrip():
    rng = np.random.RandomState(0)
    msg = ImageFeatures(
        stamp=12.5,
        camera="front",
        segments=rng.randint(0, 9, (16, 20)).astype(np.int32),
        features=rng.randn(9, 32).astype(np.float32),
        feat_valid=rng.rand(9) > 0.3,
        K_scaled=np.eye(3, dtype=np.float32) * 2,
        pose_base_in_world=np.eye(4) + 0.1,
        pose_cam_in_base=np.eye(4) - 0.1,
    )
    buf = msg.pack()
    out = ImageFeatures.unpack(buf)
    assert out.stamp == 12.5 and out.camera == "front"
    np.testing.assert_array_equal(out.segments, msg.segments)
    np.testing.assert_array_equal(out.features, msg.features)
    np.testing.assert_array_equal(out.feat_valid, msg.feat_valid)
    np.testing.assert_allclose(out.pose_base_in_world, msg.pose_base_in_world)


def test_system_state_roundtrip():
    msg = SystemStateMsg(mode=2, mission_graph_num_valid_node=7, step=100,
                         loss_total=0.5, loss_trav=0.1, loss_reco=0.4, pause_learning=True)
    out = SystemStateMsg.unpack(msg.pack())
    assert out == msg


def test_converters():
    T = pose7_to_se3(np.array([1, 2, 3, 0, 0, 0, 1.0]))
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3])
    p7 = se3_to_pose7(T)
    np.testing.assert_allclose(p7, [1, 2, 3, 0, 0, 0, 1.0], atol=1e-9)

    K, h, w = camera_info_to_K({"K": list(np.eye(3).ravel() * 100), "height": 480, "width": 640})
    assert K[0, 0] == 100 and h == 480 and w == 640

    rs = anymal_state_to_robot_state({"stamp": 1.0, "pose": np.arange(7.0), "twist": np.arange(6.0),
                                      "joint_position": np.zeros(12)})
    assert rs["vector_state"].shape == (13,)
    assert "joint_position" in rs["states"]

    js = jackal_state_to_robot_state(
        {"stamp": 2.0, "position": [1, 0, 0], "orientation": [0, 0, 0, 1], "linear": [0.5, 0, 0], "angular": [0, 0, 0.1]},
        {"linear": [1.0, 0, 0], "angular": [0, 0, 0]},
    )
    np.testing.assert_allclose(js["twist"], [0.5, 0, 0, 0, 0, 0.1])
    np.testing.assert_allclose(js["desired_twist"], [1, 0, 0, 0, 0, 0])

    # policy debug vector [vx, vy, wz, ...] -> desired twist (reference
    # policy_debug_info_converter_node.py)
    dt = policy_debug_info_to_twist([0.3, -0.1, 0.2, 9.9], stamp=3.0)
    np.testing.assert_allclose(dt["desired_twist"], [0.3, -0.1, 0, 0, 0, 0.2])
    assert dt["stamp"] == 3.0
    with pytest.raises(ValueError):
        policy_debug_info_to_twist([1.0, 2.0])


def test_socket_transport(tmp_path):
    path = str(tmp_path / "topic.sock")
    pub = SocketPublisher(path)
    sub = SocketSubscriber(path)
    time.sleep(0.15)  # accept
    for i in range(5):
        pub.publish(f"msg{i}".encode())
    time.sleep(0.2)
    got = []
    while (m := sub.poll()) is not None:
        got.append(m.decode())
    assert got == [f"msg{i}" for i in range(5)]
    sub.close()
    pub.close()


def test_hot_swap_file_roundtrip(tmp_path):
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.models import get_model
    from wild_visual_navigation_tpu.utils.confidence_generator import confidence_init, confidence_state_dict

    m = get_model({"name": "SimpleMLP", "simple_mlp_cfg": {"input_size": 8, "hidden_sizes": [4, 1], "reconstruction": True}})
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)))
    cg = confidence_state_dict(confidence_init())
    write_hot_swap_state(str(tmp_path), params, cg, step=5)
    out = read_hot_swap_state(str(tmp_path), params)
    assert out is not None
    p2, cgd, step = out
    assert step == 5
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _small_params():
    fe = FeatureExtractorNodeParams(
        network_input_image_height=48, network_input_image_width=48,
        segmentation_type="grid", feature_type="sift", prediction_per_pixel=False,
        image_callback_rate=1000.0,
    )
    ln = LearningNodeParams(
        network_input_image_height=48, network_input_image_width=48,
        image_graph_dist_thr=0.05, supervision_graph_dist_thr=0.02,
        min_samples_for_training=3, supervision_callback_rate=1000.0,
        robot_width=0.5, robot_length=0.5, learning_thread_rate=10.0,
        load_save_checkpoint_rate=5.0,
    )
    exp = ExperimentParams()
    exp.model.simple_mlp_cfg.hidden_sizes = [16, 1]
    return fe, ln, exp


def test_two_node_pipeline_with_hot_swap(tmp_path):
    """FeatureExtractorNode publishes ImageFeatures to LearningNode; the
    learner trains and writes the hot-swap file; the extractor reloads
    it — the reference's full two-process loop in one process."""
    fe_p, ln_p, exp = _small_params()
    folder = str(tmp_path)
    topic = LocalTopic()

    fe_node = FeatureExtractorNode(params=fe_p, exp_params=exp, hot_swap_folder=folder,
                                   publish_features=topic.publish, key=jax.random.PRNGKey(0))
    ln_node = LearningNode(fe_params=fe_p, ln_params=ln_p, exp_params=exp, hot_swap_folder=folder,
                           key=jax.random.PRNGKey(1))

    K = np.array([[30.0, 0, 24], [0, 30.0, 24], [0, 0, 1]])
    cam_in_base = np.eye(4)
    cam_in_base[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]])
    cam_in_base[:3, 3] = [0, 0, 2.0]
    rng = np.random.RandomState(0)

    for i in range(30):
        stamp = i * 0.1
        x = i * 0.08
        pose = np.eye(4)
        pose[0, 3] = x
        img = rng.rand(3, 48, 48).astype(np.float32)
        out = fe_node.image_callback(img, stamp, "front", K, 48, 48, pose, cam_in_base)
        assert out is not None
        # transport pump
        while (payload := topic.poll()) is not None:
            ln_node.imagefeat_callback(payload)
        ln_node.robot_state_callback(stamp + 0.01, pose, np.array([1.0, 0, 0, 0, 0, 0]),
                                     np.array([1.0, 0, 0, 0, 0, 0]))
        ln_node.learning_step()

    est = ln_node.runtime.estimator
    assert est.step > 5
    assert est.get_num_valid_nodes() >= 3
    assert os.path.exists(os.path.join(folder, ".tmp_state_dict.msgpack"))

    # extractor reloads the learner's weights
    assert fe_node.maybe_reload_weights()
    assert fe_node._loaded_step == est.step - (est.step % 2) or fe_node._loaded_step > 0
    # second poll without a new write is a no-op
    loaded_again = fe_node.maybe_reload_weights()
    assert not loaded_again

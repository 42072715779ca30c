"""Consumer-script tests: smart carrot goal selection, overlay, mission
logger + learning-curve plots."""

import os

import numpy as np

from wild_visual_navigation_tpu.scripts import CarrotConfig, MissionLogger, select_carrot
from wild_visual_navigation_tpu.scripts.overlay_images import overlay


def test_smart_carrot_prefers_safe_far_cells():
    H = W = 41
    sdf = np.ones((H, W)) * 0.5
    sdf[:, : W // 2] = -1.0  # left half untraversable
    cell, score = select_carrot(sdf, yaw=0.0, cfg=CarrotConfig())
    assert cell is not None
    r, c = cell
    assert c > W // 2  # picks the safe (right, ahead for yaw=0) side
    assert np.isfinite(score[r, c])


def test_smart_carrot_yaw_cone():
    H = W = 41
    sdf = np.ones((H, W))
    # heading up (-y): carrot must be in the upper half
    cell, _ = select_carrot(sdf, yaw=-np.pi / 2)
    assert cell is not None and cell[0] < H // 2


def test_smart_carrot_all_blocked():
    sdf = -np.ones((21, 21))
    cell, _ = select_carrot(sdf, yaw=0.0)
    assert cell is None


def test_smart_carrot_invalid_dilation():
    H = W = 41
    sdf = np.ones((H, W))
    valid = np.ones((H, W), bool)
    valid[:, 32:] = False  # unobserved far-right band
    cell, score = select_carrot(sdf, yaw=0.0, valid=valid, cfg=CarrotConfig(invalid_dilation=2))
    assert cell is not None
    assert cell[1] < 30  # dilation pushes the carrot off the boundary


def test_overlay():
    img = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
    trav = np.linspace(0, 1, 256).reshape(16, 16)
    out = overlay(img, trav, alpha=0.5)
    assert out.shape == (16, 16, 3)
    assert out.min() >= 0 and out.max() <= 1


def test_mission_logger(tmp_path):
    lg = MissionLogger(folder=str(tmp_path), store_images=True)
    for i in range(10):
        lg.log_system_state(step=i, loss_total=1.0 / (i + 1), loss_trav=0.1, loss_reco=0.2,
                            num_valid_nodes=i, stamp=i * 0.1)
    img = np.random.RandomState(0).rand(3, 16, 16).astype(np.float32)
    lg.log_inference(img, np.random.rand(16, 16), np.random.rand(16, 16), stamp=0.5)
    csv_path = lg.store()
    assert os.path.exists(csv_path)
    assert len(open(csv_path).readlines()) == 11
    plot_path = lg.plot_learning_curves()
    assert plot_path and os.path.exists(plot_path)
    assert lg._img_count == 1


def test_visualizer_extended():
    from wild_visual_navigation_tpu.visu import LearningVisualizer

    visu = LearningVisualizer()
    img = np.random.RandomState(0).rand(3, 24, 24).astype(np.float32)
    seg = (np.arange(24 * 24) % 5).reshape(24, 24)
    out = visu.plot_detectron(img, seg, alpha=0.5)
    assert out.shape == (24, 24, 3)

    pts = np.array([[5.0, 5.0], [12.0, 18.0], [100.0, 100.0]])  # last out of bounds
    out = visu.plot_graph_on_image(img, pts, values=np.array([0.1, 0.9, 0.5]))
    assert out.shape == (24, 24, 3)

    flow = np.array([[3.0, 0.0], [0.0, -4.0], [1.0, 1.0]])
    out = visu.plot_optical_flow(img, pts, flow, valid=np.array([True, True, False]))
    assert out.shape == (24, 24, 3)
    assert np.isfinite(out).all()


def test_carrot_follower_controller():
    from wild_visual_navigation_tpu.scripts import FollowerConfig, follow_carrot

    pose = np.eye(4)  # at origin, facing +x
    # goal straight ahead -> forward, no turn
    tw = follow_carrot(pose, (2.0, 0.0))
    assert tw[0] > 0.5 and abs(tw[5]) < 1e-6
    # goal to the left -> positive yaw rate, reduced speed
    tw = follow_carrot(pose, (1.0, 1.0))
    assert tw[5] > 0.3 and tw[0] < 0.8
    # goal behind -> turn in place (cos gating stops forward motion)
    tw = follow_carrot(pose, (-1.0, 0.1))
    assert abs(tw[0]) < 1e-6 and abs(tw[5]) > 0.5
    # within tolerance -> stop
    tw = follow_carrot(pose, (0.05, 0.0))
    assert np.allclose(tw, 0)
    # no goal -> stop
    assert np.allclose(follow_carrot(pose, None), 0)


def test_yaml_config_files():
    from wild_visual_navigation_tpu.cfg import FeatureExtractorNodeParams, LearningNodeParams
    from wild_visual_navigation_tpu.utils.loading import dataclass_from_yaml

    fe = dataclass_from_yaml(FeatureExtractorNodeParams(), "configs/default.yaml")
    assert fe.segmentation_type == "slic" and fe.network_input_image_height == 224
    ln = dataclass_from_yaml(LearningNodeParams(), "configs/learning_default.yaml")
    assert ln.traversability_radius == 3.0 and ln.learning_thread_rate == 10.0

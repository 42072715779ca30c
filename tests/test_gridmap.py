"""Grid-map fusion + SDF + carrot: the closed navigation loop."""

import jax.numpy as jnp
import numpy as np

from wild_visual_navigation_tpu.ops.gridmap import (
    GridMap,
    gridmap_init,
    project_traversability_to_grid,
    traversability_sdf,
)
from wild_visual_navigation_tpu.scripts import CarrotConfig, select_carrot


def _downward_cam(H=64, W=64, height=2.0):
    K = jnp.asarray([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
    pose = jnp.asarray(
        [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, height], [0, 0, 0, 1]], jnp.float32
    )  # looking straight down from (0,0,h)
    return K, pose


def test_projection_into_grid_geometry():
    """A downward camera's image center must land at the camera's
    ground position; left/right image halves map to +/- world x."""
    H = W = 64
    K, pose = _downward_cam(H, W)
    trav = jnp.zeros((H, W))
    trav = trav.at[:, : W // 2].set(1.0)  # left half traversable
    grid = gridmap_init(size=32, resolution=0.2, center_xy=(0.0, 0.0))
    grid = project_traversability_to_grid(grid, trav, K, pose, stride=1)

    t = np.asarray(grid.traversability)
    v = np.asarray(grid.valid)
    assert v.sum() > 50
    # camera at (0,0): image u < W/2 -> world x < 0 (x_cam = +u dir, but
    # downward camera flips y; x stays aligned) -> check the two sides differ
    G = 32
    left = t[:, : G // 2][v[:, : G // 2]]
    right = t[:, G // 2 :][v[:, G // 2 :]]
    assert len(left) and len(right)
    means = sorted([left.mean(), right.mean()])
    assert means[0] < 0.2 and means[1] > 0.8  # clean separation


def test_fusion_accumulates_weighted():
    H = W = 32
    K, pose = _downward_cam(H, W)
    grid = gridmap_init(size=16, resolution=0.3)
    g1 = project_traversability_to_grid(grid, jnp.full((H, W), 1.0), K, pose,
                                        confidence=jnp.full((H, W), 1.0), stride=1)
    # second pass says 0 but with tiny confidence -> mean stays high
    g2 = project_traversability_to_grid(g1, jnp.zeros((H, W)), K, pose,
                                        confidence=jnp.full((H, W), 0.1), stride=1)
    t = np.asarray(g2.traversability)[np.asarray(g2.valid)]
    assert t.min() > 0.85


def test_sdf_signs_and_growth():
    G = 32
    trav = jnp.ones((G, G))
    trav = trav.at[:, :8].set(0.0)  # blocked band on the left
    valid = jnp.ones((G, G), bool)
    sdf = traversability_sdf(trav, valid, threshold=0.5, resolution=0.1, iterations=64)
    s = np.asarray(sdf)
    assert (s[:, :8] <= 0).all()
    assert (s[:, 8:] > 0).all()
    # distance grows with distance from the boundary
    assert s[16, 31] > s[16, 9]
    np.testing.assert_allclose(s[16, 10], 0.3, atol=0.11)  # ~3 cells * 0.1


def test_closed_navigation_loop():
    """traversability image -> grid -> sdf -> carrot goal avoids the
    blocked side."""
    H = W = 64
    K, pose = _downward_cam(H, W, height=3.0)
    trav = jnp.ones((H, W))
    trav = trav.at[:, : W // 2].set(0.05)  # left half blocked
    grid = gridmap_init(size=32, resolution=0.25)
    grid = project_traversability_to_grid(grid, trav, K, pose, stride=1)
    sdf = traversability_sdf(grid.traversability, grid.valid, resolution=0.25)
    cell, score = select_carrot(np.asarray(sdf), yaw=0.0, valid=np.asarray(grid.valid),
                                cfg=CarrotConfig(invalid_dilation=1, min_distance_cells=2))
    assert cell is not None
    r, c = cell
    # goal must be on the traversable (positive-sdf) side
    assert np.asarray(sdf)[r, c] > 0


def test_runtime_gridmap_and_carrot():
    """The grid map accumulates from runtime inference and yields a
    carrot goal ahead of the robot."""
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
        image_callback_rate=1000.0, grid_cell_size=16,
    )
    ln = LearningNodeParams(
        network_input_image_height=48, network_input_image_width=48,
        image_graph_dist_thr=0.05, supervision_graph_dist_thr=0.02,
        min_samples_for_training=3, supervision_callback_rate=1000.0,
        robot_width=0.5, robot_length=0.5,
    )
    exp = ExperimentParams()
    exp.model.simple_mlp_cfg.hidden_sizes = [16, 1]
    rt = WVNRuntime(fe_params=fe, ln_params=ln, exp_params=exp, key=jax.random.PRNGKey(0),
                    buffer_capacity=32, reprojection_fanout=8,
                    gridmap_size=32, gridmap_resolution=0.25)
    seq = synthetic_sequence(duration=4.0, frame_rate=5.0, state_rate=5.0, image_size=48, seed=0)
    run_replay(rt, seq)
    assert rt.gridmap is not None
    assert int(np.asarray(rt.gridmap.valid).sum()) > 20
    goal, score = rt.get_carrot(yaw=0.0)
    # grid is centered on the robot (x ~ 4.0 at the end); goal ahead-ish
    if goal is not None:
        assert abs(goal[0] - 4.0) < 5.0

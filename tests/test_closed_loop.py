"""Closed-loop navigation in the interactive sim world (the reference's
Gazebo + carrot_follower demo, ROS-free): camera -> online learning ->
traversability grid map -> SDF carrot -> P-controller -> world step.
"""

import jax
import numpy as np
import pytest

from wild_visual_navigation_tpu.cfg import (
    ExperimentParams,
    FeatureExtractorNodeParams,
    LearningNodeParams,
)
from wild_visual_navigation_tpu.runtime import WVNRuntime
from wild_visual_navigation_tpu.runtime.replay import SimWorld, run_closed_loop


def _runtime():
    # the configuration test_learning_quality.py proved learns the
    # obstacle appearance from proprioception alone
    fe = FeatureExtractorNodeParams(
        network_input_image_height=64, network_input_image_width=64,
        segmentation_type="grid", feature_type="sift", prediction_per_pixel=False,
        image_callback_rate=1000.0, grid_cell_size=8,
        camera_topics={"front": {"use_for_training": True}},
    )
    ln = LearningNodeParams(
        network_input_image_height=64, network_input_image_width=64,
        image_graph_dist_thr=0.15, supervision_graph_dist_thr=0.05,
        min_samples_for_training=4, supervision_callback_rate=1000.0,
        robot_width=0.8, robot_length=0.8, traversability_radius=4.0,
    )
    exp = ExperimentParams()
    exp.model.simple_mlp_cfg.hidden_sizes = [64, 32, 1]
    exp.optimizer.lr = 3e-3
    return WVNRuntime(fe_params=fe, ln_params=ln, exp_params=exp, key=jax.random.PRNGKey(0),
                      buffer_capacity=64, reprojection_fanout=16,
                      gridmap_size=128, gridmap_resolution=0.15)


def test_sim_world_render_and_grind():
    w = SimWorld(image_size=48, obstacle_xy=(2.0, 0.0), obstacle_radius=0.7)
    img = w.render()
    assert img.shape == (3, 48, 48) and np.isfinite(img).all()
    # obstacle visible ahead: dark red pixels present when near it
    w.x = 1.0
    img2 = w.render()
    red_frac = ((img2[0] > 0.4) & (img2[1] < 0.2)).mean()
    assert red_frac > 0.005, red_frac
    # grind model
    w.x, w.y = 2.0, 0.0
    assert w.step(np.array([1.0, 0, 0, 0, 0, 0]), 0.1)[0] < 0.2


@pytest.mark.slow
def test_closed_loop_learns_and_avoids_obstacle():
    """Drive THROUGH the obstacle once (supervision learns it is bad),
    then a re-observation pass must mark it untraversable in the grid
    map and the carrot must not send the robot back into it."""
    rt = _runtime()
    world = SimWorld(image_size=64, obstacle_xy=(2.5, 0.0), obstacle_radius=0.6,
                     grind_factor=0.25, seed=1)

    def tick(cmd, train_steps=4):
        pose = world.pose()
        rt.image_callback(world.render(pose), world.t, "front", world.K, 64, 64,
                          pose, world.pose_cam_in_base)
        achieved = world.step(cmd, 1.0 / 6.0)
        rt.robot_state_callback(world.t, world.pose(), achieved, cmd)
        for _ in range(train_steps):
            rt.learning_step()

    # Phase 1 — open loop straight through the obstacle.
    cmd = np.array([1.0, 0, 0, 0, 0, 0.0])
    while world.t < 16.0 and world.x < 4.5:
        tick(cmd)
    assert world.x > 3.2, f"robot never crossed the obstacle (x={world.x})"
    assert rt.estimator.step > 100, f"too little training ({rt.estimator.step})"
    sig = np.asarray(rt.estimator.buffer.signal)
    sv = np.asarray(rt.estimator.buffer.signal_valid)
    assert sig[sv].min() < 0.4, "no low-traversability supervision generated"

    # Consolidate: the learning thread keeps training from the mission
    # buffer between missions (reference: learning continues while the
    # robot is stationary).
    for _ in range(300):
        rt.learning_step()

    # Phase 2 — rebuild the grid map from TRAINED predictions: teleport
    # back and re-observe the approach without entering the obstacle
    # (the running average would otherwise be diluted by the untrained
    # predictions of phase 1).
    from wild_visual_navigation_tpu.ops.gridmap import gridmap_init

    rt.gridmap = gridmap_init(size=128, resolution=0.15)
    world.x, world.y, world.yaw = 0.2, 0.0, 0.0
    while world.x < 1.6:
        tick(cmd, train_steps=0)

    gm = rt.gridmap
    trav = np.asarray(gm.value_sum) / np.maximum(np.asarray(gm.weight), 1e-6)
    valid = np.asarray(gm.valid)
    origin = np.asarray(gm.origin_xy)

    def cell(x, y):
        c = ((np.array([x, y]) - origin) / 0.15).astype(int)
        return c[1], c[0]

    oi, oj = cell(2.5, 0.0)
    ci, cj = cell(1.7, 0.0)  # clean ground just ahead, same pass
    assert valid[oi, oj] and valid[ci, cj], "grid cells not observed"
    assert trav[oi, oj] < trav[ci, cj] - 0.15, (
        f"obstacle cell {trav[oi, oj]:.3f} not worse than clean {trav[ci, cj]:.3f}"
    )

    # Carrot goals must not point into the obstacle.
    goal, _ = rt.get_carrot(yaw=world.yaw)
    if goal is not None:
        assert not world.in_obstacle(goal[0], goal[1]), f"carrot inside obstacle: {goal}"

    # Phase 3 — smoke the full closed-loop API from the current pose.
    path, goals = run_closed_loop(rt, world, duration=world.t + 2.0, rate=6.0)
    assert len(path) > 8
    assert np.isfinite(path).all()

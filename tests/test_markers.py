"""3-D supervision marker tests: ribbon geometry, collision walls,
PLY/JSON export validity."""

import json

import numpy as np

from wild_visual_navigation_tpu.traversability.nodes import SupervisionNode
from wild_visual_navigation_tpu.visu import (
    TriangleList,
    build_footprint_ribbon,
    build_graph_path,
    export_supervision_markers,
)


def _node(x, trav=0.8, untrav=False):
    T = np.eye(4)
    T[0, 3] = x
    return SupervisionNode(
        timestamp=x, pose_base_in_world=T, width=0.6, length=1.0, height=0.4,
        twist_in_base=np.array([1.0, 0, 0, 0, 0, 0]),
        traversability=trav, is_untraversable=untrav,
    )


def test_ribbon_geometry():
    nodes = [_node(x) for x in np.linspace(0, 1, 5)]
    tri = build_footprint_ribbon(nodes)
    # 4 pairs x 2 triangles, no walls
    assert tri.num_triangles == 8
    assert tri.points.shape[0] % 3 == 0
    # ribbon spans the driven segment and the robot width
    assert tri.points[:, 0].min() >= -0.01 and tri.points[:, 0].max() <= 1.01
    np.testing.assert_allclose(sorted({round(y, 3) for y in tri.points[:, 1]}), [-0.3, 0.3])


def test_untraversable_wall_added():
    nodes = [_node(0.0), _node(0.5, trav=0.0, untrav=True)]
    tri = build_footprint_ribbon(nodes)
    assert tri.num_triangles == 4  # 2 ribbon + 2 wall
    # wall is vertical: spans height below the base origin (down to ground)
    assert tri.points[:, 2].min() <= -0.35 and np.ptp(tri.points[:, 2]) >= 0.35


def test_ply_and_json_export(tmp_path):
    nodes = [_node(x, trav=x) for x in np.linspace(0, 1, 4)]
    ply = tmp_path / "ribbon.ply"
    js = tmp_path / "ribbon.json"
    tri = export_supervision_markers(nodes, ply_path=str(ply), json_path=str(js))
    text = ply.read_text()
    assert text.startswith("ply")
    assert f"element vertex {tri.points.shape[0]}" in text
    assert f"element face {tri.num_triangles}" in text
    # parseable vertex line count matches header
    body = text.split("end_header\n")[1].strip().splitlines()
    assert len(body) == tri.points.shape[0] + tri.num_triangles
    d = json.loads(js.read_text())
    assert d["type"] == "triangle_list"
    assert len(d["points"]) == tri.points.shape[0]
    assert len(d["colors"]) == tri.points.shape[0]
    # colors follow traversability: first node red-ish (low), last blue-ish (high)
    c = np.asarray(d["colors"])
    assert c[0, 0] > c[0, 2] and c[-1, 2] > c[-1, 0]


def test_graph_path():
    nodes = [_node(x) for x in [0.0, 0.5, 1.0]]
    path = build_graph_path(nodes)
    np.testing.assert_allclose(path[:, 0], [0.0, 0.5, 1.0])
    assert build_graph_path([]).shape == (0, 3)


def test_runtime_export(tmp_path):
    import jax

    from wild_visual_navigation_tpu.cfg import (
        ExperimentParams,
        FeatureExtractorNodeParams,
        LearningNodeParams,
    )
    from wild_visual_navigation_tpu.runtime import WVNRuntime

    S = 32
    fe = FeatureExtractorNodeParams(
        network_input_image_height=S, network_input_image_width=S,
        segmentation_type="grid", feature_type="sift",
        prediction_per_pixel=True, image_callback_rate=1e9)
    ln = LearningNodeParams(
        network_input_image_height=S, network_input_image_width=S,
        image_graph_dist_thr=0.05, supervision_graph_dist_thr=0.02,
        min_samples_for_training=2, supervision_callback_rate=1e9,
        robot_width=0.6, robot_length=1.0)
    rt = WVNRuntime(fe_params=fe, ln_params=ln, exp_params=ExperimentParams(),
                    key=jax.random.PRNGKey(0), buffer_capacity=8, reprojection_fanout=4)
    for i in range(6):
        T = np.eye(4)
        T[0, 3] = 0.05 * i
        rt.robot_state_callback(i * 0.1, T, np.array([1.0, 0, 0, 0, 0, 0]),
                                np.array([1.0, 0, 0, 0, 0, 0]))
    ply = tmp_path / "m.ply"
    tri = rt.export_supervision_markers(ply_path=str(ply))
    assert tri.num_triangles > 0
    assert ply.read_text().startswith("ply")

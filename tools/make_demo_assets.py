"""Generate the committed demo/golden assets (VERDICT r3 #9).

The analogue of the reference's `assets/graph/*.pt` + demo images
(graph fixture consumed by its visualizer demos): a small RECORDED
mission sequence (the framework's "rosbag", runtime/replay.py npz
format) plus golden arrays for the end-to-end replay + visualizer
composites, consumed by tests/test_demo_assets.py.

Deterministic: fixed seeds, CPU backend, sift/grid extractor (no
random-init backbone variance). Regenerate with:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/make_demo_assets.py
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def build_runtime():
    import jax

    from wild_visual_navigation_tpu.cfg import (
        ExperimentParams,
        FeatureExtractorNodeParams,
        LearningNodeParams,
    )
    from wild_visual_navigation_tpu.runtime import WVNRuntime

    size = 64
    fe = FeatureExtractorNodeParams(
        network_input_image_height=size, network_input_image_width=size,
        segmentation_type="grid", feature_type="sift", prediction_per_pixel=False,
        image_callback_rate=1000.0, grid_cell_size=8,
    )
    ln = LearningNodeParams(
        network_input_image_height=size, network_input_image_width=size,
        image_graph_dist_thr=0.15, supervision_graph_dist_thr=0.05,
        min_samples_for_training=4, supervision_callback_rate=1000.0,
        robot_width=0.8, robot_length=0.8, traversability_radius=4.0,
    )
    exp = ExperimentParams()
    exp.model.simple_mlp_cfg.hidden_sizes = [64, 32, 1]
    exp.optimizer.lr = 3e-3
    return WVNRuntime(fe_params=fe, ln_params=ln, exp_params=exp, key=jax.random.PRNGKey(0),
                      buffer_capacity=64, reprojection_fanout=16)


def main() -> int:
    import numpy as np

    from wild_visual_navigation_tpu.runtime import run_replay, save_sequence, synthetic_sequence
    from wild_visual_navigation_tpu.visu import LearningVisualizer

    seq_path = REPO / "assets" / "sequences" / "demo_mission.npz"
    golden_path = REPO / "assets" / "goldens" / "demo_mission_replay.npz"
    os.makedirs(seq_path.parent, exist_ok=True)

    # 1. the recorded sequence (the committed "rosbag")
    seq = synthetic_sequence(duration=10.0, frame_rate=5.0, state_rate=5.0,
                             image_size=64, seed=0, obstacle_x=6.0)
    save_sequence(seq, str(seq_path))
    print(f"wrote {seq_path} ({seq_path.stat().st_size / 1024:.0f} KiB, "
          f"{len(seq.frames)} frames, {len(seq.states)} states)")

    # 2. replay it through the product runtime and store goldens
    rt = build_runtime()
    np.random.seed(7)
    report = run_replay(rt, seq, train_every_state=4)
    assert report.train_steps > 50, report

    frame = seq.frames[18]
    res = rt.image_callback(frame.image, 1e6, frame.camera, frame.K, 64, 64,
                            frame.pose_base_in_world, frame.pose_cam_in_base)
    trav = np.asarray(res.traversability)

    # 3. visualizer composite golden (the reference's graph-fixture
    # plots): traversability overlay on the probe frame
    visu = LearningVisualizer()
    overlay = visu.plot_traversability_overlay(frame.image, trav)

    np.savez_compressed(
        golden_path,
        probe_stamp=np.float64(frame.stamp),
        traversability=trav.astype(np.float32),
        overlay=np.asarray(overlay, np.uint8),
        train_steps=np.int64(report.train_steps),
        valid_nodes=np.int64(report.valid_nodes),
    )
    print(f"wrote {golden_path} ({golden_path.stat().st_size / 1024:.0f} KiB, "
          f"steps={report.train_steps}, valid={report.valid_nodes}, "
          f"trav mean={trav.mean():.4f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

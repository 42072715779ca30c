"""Committed demo/golden assets (VERDICT r3 #9) — the analogue of the
reference's `assets/graph/*.pt` fixtures: a recorded mission sequence
(assets/sequences/demo_mission.npz, the framework's "rosbag") and a
golden replay result (assets/goldens/demo_mission_replay.npz).

The test replays the committed sequence through the product runtime
and checks the outcome against the golden within tolerances (XLA:CPU
numerics vary slightly across hosts; exact equality is not portable).
Regenerate assets with tools/make_demo_assets.py.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
SEQ = REPO / "assets" / "sequences" / "demo_mission.npz"
GOLDEN = REPO / "assets" / "goldens" / "demo_mission_replay.npz"


@pytest.mark.slow
def test_demo_sequence_replay_matches_golden():
    assert SEQ.exists() and GOLDEN.exists(), "run tools/make_demo_assets.py"
    sys.path.insert(0, str(REPO))
    from tools.make_demo_assets import build_runtime

    from wild_visual_navigation_tpu.runtime import load_sequence, run_replay
    from wild_visual_navigation_tpu.visu import LearningVisualizer

    seq = load_sequence(str(SEQ))
    assert len(seq.frames) >= 30 and len(seq.states) >= 30

    golden = np.load(GOLDEN)
    rt = build_runtime()
    np.random.seed(7)
    report = run_replay(rt, seq, train_every_state=4)

    g_steps = int(golden["train_steps"])
    assert abs(report.train_steps - g_steps) <= max(2, g_steps // 10), (
        f"train steps drifted: {report.train_steps} vs golden {g_steps}"
    )

    frame = next(f for f in seq.frames if abs(f.stamp - float(golden["probe_stamp"])) < 1e-6)
    res = rt.image_callback(frame.image, 1e6, frame.camera, frame.K, 64, 64,
                            frame.pose_base_in_world, frame.pose_cam_in_base)
    trav = np.asarray(res.traversability)
    g_trav = golden["traversability"]
    mae = float(np.abs(trav - g_trav).mean())
    assert mae < 0.05, f"replay traversability drifted from golden: MAE {mae:.4f}"

    # visualizer composite vs golden overlay (loose: rendering path +
    # trav drift)
    overlay = np.asarray(LearningVisualizer().plot_traversability_overlay(frame.image, trav))
    g_overlay = golden["overlay"]
    assert overlay.shape == g_overlay.shape
    o_mae = float(np.abs(overlay.astype(np.float32) - g_overlay.astype(np.float32)).mean())
    assert o_mae < 8.0, f"visualizer overlay drifted from golden: MAE {o_mae:.2f} (uint8)"

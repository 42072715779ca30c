"""The whole framework in ~50 lines: online self-supervised
traversability learning on a synthetic drive.

This is the smallest end-to-end use of the public API — what the
reference does with two ROS nodes and a rosbag
(wvn_feature_extractor_node + wvn_learning_node), in one process:

    camera frames -> fused frozen-backbone inference -> mission graph
    robot state   -> supervision (velocity tracking)  -> reprojection
    train step    -> confidence-weighted loss -> hot-swapped weights

Run (TPU or CPU):
    python examples/minimal_online_loop.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

from wild_visual_navigation_tpu.cfg import (
    ExperimentParams,
    FeatureExtractorNodeParams,
    LearningNodeParams,
)
from wild_visual_navigation_tpu.runtime import WVNRuntime, run_replay, synthetic_sequence

# 1. Configure — the same knobs as the reference's default.yaml
#    (rates, graph distances, network input size), as dataclasses.
fe = FeatureExtractorNodeParams(
    network_input_image_height=112,
    network_input_image_width=112,
    segmentation_type="grid",      # or "slic", "none", "stego"
    feature_type="dino",           # or "dinov2", "stego", "torchvision", "sift"
    dino_backbone="vit_small",
    dino_patch_size=8,
    image_callback_rate=1000.0,    # no rate gating for the demo
)
ln = LearningNodeParams(
    min_samples_for_training=4,
    image_graph_dist_thr=0.1,
    supervision_callback_rate=1000.0,
)

# 2. Build the runtime: frozen ViT + traversability head + confidence,
#    mission/supervision graphs, fused single-dispatch frame program.
rt = WVNRuntime(fe_params=fe, ln_params=ln, exp_params=ExperimentParams(),
                key=jax.random.PRNGKey(0), buffer_capacity=32, reprojection_fanout=8)

# 3. Drive it. synthetic_sequence stands in for a rosbag: timestamped
#    camera frames + robot state (pose, twist, desired twist). Swap in
#    runtime.replay.Sequence.load(...) for a recorded mission.
seq = synthetic_sequence(duration=6.0, frame_rate=5.0, state_rate=10.0,
                         image_size=112, seed=0)
report = run_replay(rt, seq, train_every_state=1, verbose=False)

print(f"frames processed: {report.frames_processed}")
print(f"supervision updates: {report.supervision_updates}")
print(f"train steps: {report.train_steps}  final loss: {report.final_loss:.4f}")

# 4. Everything the reference's services expose is a method away:
ckpt = rt.save_checkpoint("/tmp/wvn_demo", "demo.ckpt")
print(f"checkpoint: {ckpt}")

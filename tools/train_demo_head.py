"""Train and ship the demo traversability head + confidence state.

Runs the full online self-supervised loop (WVNRuntime + the synthetic
replay world with an obstacle band, runtime/replay.py) using EXACTLY
quick_start.py's backbone configuration (dino ViT-S/8 @224, slic,
key=PRNGKey(0)), then stores the mission checkpoint under
assets/checkpoints/ so `python quick_start.py` demonstrates a LEARNED
head + calibrated confidence out of the box (reference quick_start
loads released pretrained checkpoints, quick_start.py:141-150 — this
environment has no egress, so the shipped head is framework-trained on
the replay world; convert real checkpoints with
tools/convert_dino_weights.py for field use).

Usage: python tools/train_demo_head.py [--duration 20] [--out assets/checkpoints]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--out", type=str, default="assets/checkpoints")
    ap.add_argument("--name", type=str, default="replay_demo_head.ckpt")
    args = ap.parse_args()

    import jax

    from wild_visual_navigation_tpu.cfg import FeatureExtractorNodeParams, LearningNodeParams
    from wild_visual_navigation_tpu.runtime import WVNRuntime, run_replay, synthetic_sequence

    fe = FeatureExtractorNodeParams(
        network_input_image_height=args.image_size,
        network_input_image_width=args.image_size,
        segmentation_type="slic",
        feature_type="dino",
        dino_backbone="vit_small",
        dino_patch_size=8,
        image_callback_rate=1000.0,
        camera_topics={"front": {"use_for_training": True}},
    )
    ln = LearningNodeParams(
        min_samples_for_training=4,
        supervision_callback_rate=1000.0,
        image_graph_dist_thr=0.1,
        supervision_graph_dist_thr=0.05,
        # match quick_start.py's inference-side ConfidenceConfig: the
        # runtime propagates this into the loss (reference
        # wvn_learning_node.py:196), so the shipped cg_state is
        # calibrated under the same factor quick_start thresholds with
        confidence_std_factor=0.5,
    )
    rt = WVNRuntime(fe_params=fe, ln_params=ln, key=jax.random.PRNGKey(0))

    seq = synthetic_sequence(
        duration=args.duration, frame_rate=5.0, state_rate=10.0,
        image_size=args.image_size, seed=3, obstacle_x=args.duration * 0.6,
    )
    report = run_replay(rt, seq, train_every_state=2, verbose=True)
    print(f"frames={report.frames_processed} supervision={report.supervision_updates} "
          f"train_steps={report.train_steps} final_loss={report.final_loss:.4f}")
    assert report.train_steps > 20, "replay produced too few training steps"

    path = rt.estimator.save_checkpoint(args.out, args.name)
    print(f"checkpoint: {path}")


if __name__ == "__main__":
    main()

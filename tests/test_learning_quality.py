"""The headline capability test: the online loop LEARNS to predict the
untraversable region from appearance (BASELINE config 4 semantics).

A robot drives over textured ground with a visually-distinct dark-red
band where velocity tracking collapses; after the self-supervised
session, the model must score the red band lower than the surrounding
terrain in a *new* frame — visual traversability learned purely from
proprioception, no manual labels anywhere.
"""

import jax
import numpy as np
import pytest

from wild_visual_navigation_tpu.cfg import (
    ExperimentParams,
    FeatureExtractorNodeParams,
    LearningNodeParams,
)
from wild_visual_navigation_tpu.runtime import WVNRuntime, run_replay, synthetic_sequence


@pytest.mark.slow
def test_online_loop_learns_obstacle_appearance():
    fe = FeatureExtractorNodeParams(
        network_input_image_height=64, network_input_image_width=64,
        # per-segment scoring: training consumes pooled segment features,
        # so inference must too (per-pixel SIFT descriptors are a
        # different distribution than pooled ones; DINO features are
        # smooth enough that the reference mixes the two, SIFT is not)
        segmentation_type="grid", feature_type="sift", prediction_per_pixel=False,
        image_callback_rate=1000.0, grid_cell_size=8,
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
    rt = WVNRuntime(fe_params=fe, ln_params=ln, exp_params=exp, key=jax.random.PRNGKey(0),
                    buffer_capacity=64, reprojection_fanout=16)

    obstacle_x = 6.0
    seq = synthetic_sequence(duration=12.0, frame_rate=5.0, state_rate=5.0,
                             image_size=64, seed=0, obstacle_x=obstacle_x)
    report = run_replay(rt, seq, train_every_state=4)
    assert report.train_steps > 100
    assert report.valid_nodes >= 10

    # labels must reflect the tracking failure: some low supervision
    sig = np.asarray(rt.estimator.buffer.signal)
    sv = np.asarray(rt.estimator.buffer.signal_valid)
    assert sig[sv].min() < 0.3, "no low-traversability supervision was generated"
    assert sig[sv].max() > 0.8, "no high-traversability supervision was generated"

    # Fresh frame approaching the band. The system's promise: terrain
    # that looks like what the robot traversed well scores high, the
    # obstacle appearance scores low. (Never-traversed appearance is
    # *also* pushed low by the anomaly-balanced objective — by design —
    # so the comparison is band vs the driven corridor, not band vs
    # everything.)
    frame = next(f for f in seq.frames if abs(f.stamp - 3.6) < 0.11)
    res = rt.image_callback(frame.image, 1e6, "front", frame.K, 64, 64,
                            frame.pose_base_in_world, frame.pose_cam_in_base)
    assert res is not None
    trav = np.asarray(res.traversability)
    img = frame.image  # (3, 64, 64)
    band = (img[0] > 0.4) & (img[1] < 0.2)  # the dark-red surface
    corridor = np.zeros_like(band)
    corridor[40:, 24:40] = True  # near-field footprint strip (driven)
    corridor &= ~band
    assert band.sum() > 50, "obstacle band not visible in the probe frame"
    band_trav = float(trav[band].mean())
    corridor_trav = float(trav[corridor].mean())
    assert corridor_trav > 0.6, f"driven corridor not scored traversable ({corridor_trav:.3f})"
    assert band_trav < corridor_trav - 0.3, (
        f"model did not learn the obstacle: band {band_trav:.3f} vs corridor {corridor_trav:.3f}"
    )

    # Pinned ROC gate (VERDICT r3 #7), mirroring the reference's
    # offline ROC/AUC metrics (.deprecated/lightning/
    # lightning_module.py:26-28): over band + corridor pixels, with
    # band = untraversable class and (1 - trav) as the untraversable
    # score, the AUC must clear a hard numeric threshold so learning
    # regressions fail CI quantitatively, not just directionally.
    from wild_visual_navigation_tpu.offline.metrics import auroc

    pix = band | corridor
    auc = auroc((1.0 - trav)[pix], band[pix])
    # measured 0.85 on this replay (SIFT @64 px); 0.80 = regression
    # floor with headroom (0.5 would be chance)
    assert auc >= 0.80, f"obstacle-vs-corridor AUC regressed: {auc:.3f} < 0.80"
    # and the separation margin itself, pinned
    assert corridor_trav - band_trav >= 0.35, (
        f"separation margin regressed: {corridor_trav - band_trav:.3f} < 0.35"
    )

"""Runtime tests: scheduler order (reference run_scheduler assertions,
scheduler.py:68-102), config overlays, and the full online replay loop
at tiny sizes on CPU."""

import dataclasses

import jax
import numpy as np
import pytest

from wild_visual_navigation_tpu.cfg import (
    ExperimentParams,
    FeatureExtractorNodeParams,
    LearningNodeParams,
)
from wild_visual_navigation_tpu.runtime import Scheduler, WVNRuntime, run_replay, synthetic_sequence
from wild_visual_navigation_tpu.utils.loading import apply_overrides


def test_scheduler_uniform():
    s = Scheduler()
    s.add_process("p1", 1)
    s.add_process("p2", 1)
    s.add_process("p3", 1)
    order = []
    for _ in range(4):
        order.append(s.get())
        s.step()
    assert order == ["p1", "p2", "p3", "p1"]


def test_scheduler_weighted():
    s = Scheduler()
    s.add_process("p1", 2)
    s.add_process("p2", 1)
    s.add_process("p3", 2)
    s.add_process("p4", 1)
    order = []
    for _ in range(6):
        order.append(s.get())
        s.step()
    assert order == ["p1", "p2", "p3", "p4", "p1", "p3"]


def test_config_overrides():
    exp = ExperimentParams()
    exp2 = apply_overrides(exp, {"loss.w_trav": 0.1, "model.name": "DoubleMLP", "optimizer.lr": 0.01})
    assert exp2.loss.w_trav == 0.1
    assert exp2.model.name == "DoubleMLP"
    assert exp2.optimizer.lr == 0.01
    assert exp.loss.w_trav == 0.03  # original untouched
    with pytest.raises(KeyError):
        apply_overrides(exp, {"loss.not_a_field": 1})


def _tiny_runtime(**kw):
    fe = FeatureExtractorNodeParams(
        network_input_image_height=48,
        network_input_image_width=48,
        segmentation_type="grid",
        feature_type="sift",
        slic_num_components=16,
        prediction_per_pixel=False,
        image_callback_rate=100.0,
    )
    # cell_size default 32 -> grid 2x2 at 48px
    ln = LearningNodeParams(
        network_input_image_height=48,
        network_input_image_width=48,
        image_graph_dist_thr=0.05,
        supervision_graph_dist_thr=0.02,
        min_samples_for_training=3,
        supervision_callback_rate=100.0,
        robot_width=0.5,
        robot_length=0.5,
    )
    exp = ExperimentParams()
    exp.model.simple_mlp_cfg.hidden_sizes = [32, 1]
    return WVNRuntime(fe_params=fe, ln_params=ln, exp_params=exp, key=jax.random.PRNGKey(0),
                      buffer_capacity=32, reprojection_fanout=8, **kw)


def test_runtime_replay_end_to_end():
    rt = _tiny_runtime()
    seq = synthetic_sequence(duration=4.0, frame_rate=5.0, state_rate=5.0, image_size=48, seed=0)
    report = run_replay(rt, seq)
    assert report.frames_processed >= 15
    assert report.supervision_updates >= 5
    assert report.valid_nodes >= 4
    assert report.train_steps >= 5
    assert np.isfinite(report.final_loss)
    res = report.last_result
    assert res is not None
    assert res.traversability.shape == (48, 48)
    assert res.confidence.shape == (48, 48)
    assert np.all(res.traversability >= 0) and np.all(res.traversability <= 1)


def test_runtime_hot_swap_updates_inference():
    rt = _tiny_runtime()
    seq = synthetic_sequence(duration=3.0, frame_rate=5.0, state_rate=5.0, image_size=48, seed=1)
    run_replay(rt, seq)
    p_before = rt._inference_params
    # more training then explicit swap
    for _ in range(3):
        rt.learning_step()
    rt.hot_swap()
    leaves0 = jax.tree_util.tree_leaves(p_before)
    leaves1 = jax.tree_util.tree_leaves(rt._inference_params)
    diff = max(float(np.abs(np.asarray(a) - np.asarray(b)).max()) for a, b in zip(leaves0, leaves1))
    assert diff > 0  # params actually advanced


def test_runtime_rate_gate_and_scheduler():
    rt = _tiny_runtime()
    rt.fe_params.image_callback_rate = 1.0  # gate to 1 Hz
    seq = synthetic_sequence(duration=3.0, frame_rate=10.0, state_rate=0.0, image_size=48, seed=2)
    report = run_replay(rt, seq)
    assert report.frames_processed <= 4
    assert report.frames_gated >= 20


def test_runtime_checkpoint_services(tmp_path):
    rt = _tiny_runtime()
    seq = synthetic_sequence(duration=3.0, frame_rate=5.0, state_rate=5.0, image_size=48, seed=3)
    run_replay(rt, seq)
    path = rt.save_checkpoint(str(tmp_path))
    step0 = rt.estimator.step
    rt2 = _tiny_runtime()
    rt2.load_checkpoint(path)
    assert rt2.estimator.step == step0
    rt2.pause_learning(True)
    assert rt2.learning_step().loss_total == -1.0 or rt2.estimator.pause_learning


def test_runtime_multi_camera_scheduling():
    """Two cameras arbitrated by the weighted scheduler; both feed the
    same mission graph (BASELINE config 5's multi-camera axis)."""
    fe = FeatureExtractorNodeParams(
        network_input_image_height=48, network_input_image_width=48,
        segmentation_type="grid", feature_type="sift", prediction_per_pixel=False,
        image_callback_rate=1000.0,
        camera_topics={
            "front": {"use_for_training": True, "scheduler_weight": 2},
            "rear": {"use_for_training": False, "scheduler_weight": 1},
        },
    )
    ln = LearningNodeParams(
        network_input_image_height=48, network_input_image_width=48,
        image_graph_dist_thr=0.01, supervision_graph_dist_thr=0.02,
        min_samples_for_training=3, supervision_callback_rate=1000.0,
        robot_width=0.5, robot_length=0.5,
    )
    exp = ExperimentParams()
    exp.model.simple_mlp_cfg.hidden_sizes = [16, 1]
    rt = WVNRuntime(fe_params=fe, ln_params=ln, exp_params=exp, key=jax.random.PRNGKey(0),
                    buffer_capacity=32, reprojection_fanout=8)

    import numpy as np

    K = np.array([[30.0, 0, 24], [0, 30.0, 24], [0, 0, 1]])
    cam_in_base = np.eye(4)
    cam_in_base[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]])
    cam_in_base[:3, 3] = [0, 0, 2.0]
    rng = np.random.RandomState(0)
    processed = {"front": 0, "rear": 0}
    for i in range(30):
        pose = np.eye(4)
        pose[0, 3] = i * 0.05
        for cam in ("front", "rear"):
            img = rng.rand(3, 48, 48).astype(np.float32)
            res = rt.image_callback(img, i * 0.1, cam, K, 48, 48, pose, cam_in_base)
            if res is not None:
                processed[cam] += 1
    # weighted round robin: front gets ~2x rear's frames
    assert processed["front"] > processed["rear"] >= 5
    # rear frames (use_for_training=False) never enter the mission graph
    cams = {n.camera_name for n in rt.estimator.get_mission_nodes()}
    assert cams == {"front"}


def test_sequence_save_load_roundtrip(tmp_path):
    from wild_visual_navigation_tpu.runtime import load_sequence, save_sequence

    seq = synthetic_sequence(duration=1.0, frame_rate=3.0, state_rate=3.0, image_size=32, seed=4)
    path = str(tmp_path / "seq.npz")
    save_sequence(seq, path)
    seq2 = load_sequence(path)
    assert len(seq2.frames) == len(seq.frames)
    assert len(seq2.states) == len(seq.states)
    np.testing.assert_allclose(seq2.frames[0].image, seq.frames[0].image)
    np.testing.assert_allclose(seq2.states[-1].current_twist, seq.states[-1].current_twist)
    assert seq2.frames[0].camera == "front"


def test_status_monitor():
    import time as _time

    from wild_visual_navigation_tpu.runtime.status import StatusMonitor

    mon = StatusMonitor(rate_hz=100, stale_after=0.05, printer=None)
    mon.tick("front_camera")
    mon.tick("robot_state")
    rows = mon.rows()
    assert {r["input"] for r in rows} == {"front_camera", "robot_state"}
    assert all(r["state"] == "ok" for r in rows)
    _time.sleep(0.08)
    rows = mon.rows()
    assert all(r["state"] in ("stale", "dead") for r in rows)
    s = mon.render()
    assert "front_camera" in s


def test_runtime_accepts_uint8_frames():
    rt = _tiny_runtime()
    seq = synthetic_sequence(duration=2.0, frame_rate=5.0, state_rate=5.0, image_size=48, seed=7)
    f = seq.frames[0]
    img_u8 = (f.image * 255).astype(np.uint8)
    res = rt.image_callback(img_u8, f.stamp, f.camera, f.K, 48, 48,
                            f.pose_base_in_world, f.pose_cam_in_base)
    assert res is not None
    t = np.asarray(res.traversability)
    assert t.shape == (48, 48) and np.isfinite(t).all()


def test_score_at_patch_res_matches_per_pixel():
    """VERDICT r1 #3: patch-resolution scoring (score trav per patch
    token, upsample the 1-channel map) must agree with the reference
    order (upsample D-channel features, score every pixel) within the
    bilinear-vs-MLP-nonlinearity tolerance — it is a perf flag, not a
    behavior change."""
    import jax
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.models import get_model
    from wild_visual_navigation_tpu.models.vit import make_vit
    from wild_visual_navigation_tpu.runtime.fused import build_fused_frame_fn
    from wild_visual_navigation_tpu.utils.confidence_generator import (
        ConfidenceConfig,
        confidence_init,
    )

    H = 64
    vit = make_vit("dino", "vit_small", 8, attention_impl="xla", dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    vp = vit.init(key, jnp.zeros((1, 3, H, H)))
    D = vit.cfg.embed_dim
    mlp = get_model({
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [32, 1], "reconstruction": True},
    })
    mp = mlp.init(jax.random.fold_in(key, 1), jnp.zeros((1, D)))
    cg = confidence_init()
    cfg = ConfidenceConfig()

    kw = dict(input_size=H, segmentation_type="grid", num_segments=16, cell_size=16,
              prediction_per_pixel=True)
    slow = build_fused_frame_fn(vit, mlp, cfg, score_at_patch_res=False, **kw)
    fast = build_fused_frame_fn(vit, mlp, cfg, score_at_patch_res=True, **kw)

    img = jax.random.uniform(jax.random.fold_in(key, 2), (1, 3, H, H))
    a = slow(vp, mp, cg, img)
    b = fast(vp, mp, cg, img)
    ta, tb = np.asarray(a.traversability), np.asarray(b.traversability)
    assert ta.shape == tb.shape == (H, H)
    # scoring order differs only through the MLP nonlinearity across
    # the bilinear interpolation; agreement should be tight on smooth
    # regions and bounded everywhere
    assert np.abs(ta - tb).mean() < 0.03, np.abs(ta - tb).mean()
    assert np.percentile(np.abs(ta - tb), 95) < 0.1
    # pooled features: full-res vs patch-grid pooling of the same field
    fa, fb = np.asarray(a.features), np.asarray(b.features)
    valid = np.asarray(a.feat_valid) & np.asarray(b.feat_valid)
    ra = fa[valid] / (np.linalg.norm(fa[valid], axis=-1, keepdims=True) + 1e-9)
    rb = fb[valid] / (np.linalg.norm(fb[valid], axis=-1, keepdims=True) + 1e-9)
    cos = (ra * rb).sum(-1)
    assert cos.min() > 0.98, cos.min()


def test_fused_anomaly_mode():
    """Anomaly mode (LinearRnvp) runs through the fused single-dispatch
    frame program too (traversability = calibrated flow likelihood,
    reference wvn_feature_extractor_node.py:335-338)."""
    import jax
    import numpy as np

    from wild_visual_navigation_tpu.cfg import (
        ExperimentParams,
        FeatureExtractorNodeParams,
        LearningNodeParams,
    )
    from wild_visual_navigation_tpu.runtime import WVNRuntime

    fe = FeatureExtractorNodeParams(
        network_input_image_height=32, network_input_image_width=32,
        segmentation_type="grid", feature_type="dino",
        dino_backbone="vit_small", dino_patch_size=8,
        image_callback_rate=1000.0, grid_cell_size=8,
        camera_topics={"front": {"use_for_training": True}},
    )
    ln = LearningNodeParams(min_samples_for_training=2,
                            image_graph_dist_thr=0.05,
                            supervision_callback_rate=1000.0)
    exp = ExperimentParams()
    exp.model.name = "LinearRnvp"
    rt = WVNRuntime(fe_params=fe, ln_params=ln, exp_params=exp,
                    key=jax.random.PRNGKey(0), anomaly_detection=True,
                    buffer_capacity=8, reprojection_fanout=4)
    assert rt._fused_frame is not None  # anomaly mode is fused now

    img = np.random.RandomState(0).rand(3, 40, 40).astype(np.float32)
    K = np.array([[30.0, 0, 20], [0, 30, 20], [0, 0, 1]])
    Tc = np.eye(4)
    Tc[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]])
    Tc[2, 3] = 2.0
    res = rt.image_callback(img, 0.0, "front", K, 40, 40, np.eye(4), Tc)
    assert res is not None and res.traversability.shape == (32, 32)
    t = np.asarray(res.traversability)
    assert np.isfinite(t).all() and t.min() >= 0 and t.max() <= 1

    # online anomaly training runs against the buffered features
    for i in range(1, 6):
        T = np.eye(4)
        T[0, 3] = i * 0.3
        rt.image_callback(img + 0.01 * i, float(i), "front", K, 40, 40, T, Tc)
        pT = np.eye(4)
        pT[0, 3] = i * 0.3 + 0.5
        rt.robot_state_callback(float(i) + 0.5, pT, np.array([1.0, 0, 0, 0, 0, 0]),
                                np.array([1.0, 0, 0, 0, 0, 0]))
    for _ in range(8):
        st = rt.learning_step()
    assert st.step > 0, "anomaly training never ran"


def test_runtime_int8_static_product_path():
    """dino_quant="int8_static" as a product config knob (VERDICT r4
    #5 follow-through): WVNRuntime builds the statically-quantized
    backbone from cfg, calibrate_backbone() records the scales and
    refreshes the fused programs' params, and the full frame +
    learning path runs with finite in-range outputs."""
    import jax
    import numpy as np

    from wild_visual_navigation_tpu.cfg import (
        ExperimentParams,
        FeatureExtractorNodeParams,
        LearningNodeParams,
    )
    from wild_visual_navigation_tpu.runtime import WVNRuntime

    fe = FeatureExtractorNodeParams(
        network_input_image_height=32, network_input_image_width=32,
        segmentation_type="grid", feature_type="dino",
        dino_backbone="vit_small", dino_patch_size=8,
        dino_quant="int8_static",
        image_callback_rate=1000.0, grid_cell_size=8,
        camera_topics={"front": {"use_for_training": True}},
    )
    ln = LearningNodeParams(min_samples_for_training=2,
                            image_graph_dist_thr=0.05,
                            supervision_callback_rate=1000.0)
    exp = ExperimentParams()
    exp.model.simple_mlp_cfg.hidden_sizes = [32, 1]
    rt = WVNRuntime(fe_params=fe, ln_params=ln, exp_params=exp,
                    key=jax.random.PRNGKey(0),
                    buffer_capacity=8, reprojection_fanout=4)

    rng = np.random.RandomState(0)
    cal = [rng.rand(1, 3, 32, 32).astype(np.float32) for _ in range(2)]
    assert rt.calibrate_backbone(cal) is True
    # the refreshed params carry nonzero recorded scales
    amaxes = jax.tree_util.tree_leaves(rt._vit_params["quant_cal"])
    assert amaxes and all(float(a) > 0 for a in amaxes)

    img = rng.rand(3, 40, 40).astype(np.float32)
    K = np.array([[30.0, 0, 20], [0, 30, 20], [0, 0, 1]])
    Tc = np.eye(4)
    Tc[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]])
    Tc[2, 3] = 2.0
    res = rt.image_callback(img, 0.0, "front", K, 40, 40, np.eye(4), Tc)
    assert res is not None and res.traversability.shape == (32, 32)
    t = np.asarray(res.traversability)
    assert np.isfinite(t).all() and t.min() >= 0 and t.max() <= 1

    for i in range(1, 5):
        T = np.eye(4)
        T[0, 3] = i * 0.3
        rt.image_callback(img + 0.01 * i, float(i), "front", K, 40, 40, T, Tc)
        pT = np.eye(4)
        pT[0, 3] = i * 0.3 + 0.5
        rt.robot_state_callback(float(i) + 0.5, pT, np.array([1.0, 0, 0, 0, 0, 0]),
                                np.array([1.0, 0, 0, 0, 0, 0]))
    for _ in range(8):
        st = rt.learning_step()
    assert st.step > 0, "training never ran on the quantized backbone"

    # a bf16 runtime's calibrate is a no-op
    rt_bf16 = _tiny_runtime()
    assert rt_bf16.calibrate_backbone(cal) is False


def test_runtime_with_double_mlp():
    """DoubleMLP (separate trav/reco towers, reference simple_mlp.py:42)
    through the full online loop — same output contract as SimpleMLP,
    so the fused path and estimator train on it unchanged."""
    import jax
    import numpy as np

    from wild_visual_navigation_tpu.cfg import (
        ExperimentParams,
        FeatureExtractorNodeParams,
        LearningNodeParams,
    )
    from wild_visual_navigation_tpu.runtime import WVNRuntime

    fe = FeatureExtractorNodeParams(
        network_input_image_height=32, network_input_image_width=32,
        segmentation_type="grid", feature_type="dino",
        dino_backbone="vit_small", dino_patch_size=8,
        image_callback_rate=1000.0, grid_cell_size=8,
        camera_topics={"front": {"use_for_training": True}},
    )
    ln = LearningNodeParams(min_samples_for_training=2,
                            image_graph_dist_thr=0.05,
                            supervision_callback_rate=1000.0)
    exp = ExperimentParams()
    exp.model.name = "DoubleMLP"
    rt = WVNRuntime(fe_params=fe, ln_params=ln, exp_params=exp,
                    key=jax.random.PRNGKey(0), buffer_capacity=8, reprojection_fanout=4)
    assert rt._fused_frame is not None

    img = np.random.RandomState(0).rand(3, 40, 40).astype(np.float32)
    K = np.array([[30.0, 0, 20], [0, 30, 20], [0, 0, 1]])
    Tc = np.eye(4)
    Tc[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]])
    Tc[2, 3] = 2.0
    for i in range(6):
        T = np.eye(4)
        T[0, 3] = i * 0.3
        res = rt.image_callback(img + 0.01 * i, float(i), "front", K, 40, 40, T, Tc)
        pT = np.eye(4)
        pT[0, 3] = i * 0.3 + 0.5
        rt.robot_state_callback(float(i) + 0.1, pT, np.array([1.0, 0, 0, 0, 0, 0]),
                                np.array([1.0, 0, 0, 0, 0, 0]))
    assert res is not None and np.isfinite(np.asarray(res.traversability)).all()
    for _ in range(8):
        st = rt.learning_step()
    assert st.step > 0 and st.loss_total >= 0


def test_runtime_with_torchvision_fused():
    """CNN-pyramid (torchvision) mode through the fused single-dispatch
    path: resnet18 pyramid -> multiscale segment pooling -> per-segment
    scoring, plus the online loop."""
    import jax
    import numpy as np

    from wild_visual_navigation_tpu.cfg import FeatureExtractorNodeParams, LearningNodeParams
    from wild_visual_navigation_tpu.runtime import WVNRuntime

    fe = FeatureExtractorNodeParams(
        network_input_image_height=32, network_input_image_width=32,
        segmentation_type="grid", feature_type="torchvision",
        prediction_per_pixel=False,
        image_callback_rate=1000.0, grid_cell_size=8,
        camera_topics={"front": {"use_for_training": True}},
    )
    ln = LearningNodeParams(min_samples_for_training=2,
                            image_graph_dist_thr=0.05,
                            supervision_callback_rate=1000.0)
    rt = WVNRuntime(fe_params=fe, ln_params=ln, key=jax.random.PRNGKey(0),
                    buffer_capacity=8, reprojection_fanout=4)
    assert rt._fused_frame is not None

    img = np.random.RandomState(0).rand(3, 40, 40).astype(np.float32)
    K = np.array([[30.0, 0, 20], [0, 30, 20], [0, 0, 1]])
    Tc = np.eye(4)
    Tc[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]])
    Tc[2, 3] = 2.0
    for i in range(5):
        T = np.eye(4)
        T[0, 3] = i * 0.3
        res = rt.image_callback(img + 0.01 * i, float(i), "front", K, 40, 40, T, Tc)
        pT = np.eye(4)
        pT[0, 3] = i * 0.3 + 0.5
        rt.robot_state_callback(float(i) + 0.1, pT, np.array([1.0, 0, 0, 0, 0, 0]),
                                np.array([1.0, 0, 0, 0, 0, 0]))
    assert res is not None and np.isfinite(np.asarray(res.traversability)).all()
    feats = np.asarray(rt.estimator.buffer.features[0])
    assert np.isfinite(feats).all() and np.abs(feats).sum() > 0
    for _ in range(6):
        st = rt.learning_step()
    assert st.step > 0


def test_runtime_with_simple_gcn():
    """SimpleGCN through the ONLINE runtime end to end — the reference
    trains its GCN on pyg graphs with per-node edge_index
    (make_batch + as_pyg_data); here the frame adjacency feeds
    per-segment scoring and the train step recomputes each node's
    adjacency from the stored segmentation."""
    import jax
    import numpy as np

    from wild_visual_navigation_tpu.cfg import (
        ExperimentParams,
        FeatureExtractorNodeParams,
        LearningNodeParams,
    )
    from wild_visual_navigation_tpu.runtime import WVNRuntime, run_replay, synthetic_sequence

    size = 48
    fe = FeatureExtractorNodeParams(
        network_input_image_height=size, network_input_image_width=size,
        segmentation_type="grid", feature_type="sift", prediction_per_pixel=False,
        image_callback_rate=1000.0, grid_cell_size=8,
    )
    ln = LearningNodeParams(
        network_input_image_height=size, network_input_image_width=size,
        image_graph_dist_thr=0.1, supervision_graph_dist_thr=0.05,
        min_samples_for_training=3, supervision_callback_rate=1000.0,
    )
    exp = ExperimentParams()
    exp.model.name = "SimpleGCN"
    exp.model.simple_gcn_cfg.input_size = 128  # sift feature dim
    exp.model.simple_gcn_cfg.hidden_sizes = [32, 16, 1]
    rt = WVNRuntime(fe_params=fe, ln_params=ln, exp_params=exp,
                    key=jax.random.PRNGKey(0), buffer_capacity=16,
                    reprojection_fanout=8)

    seq = synthetic_sequence(duration=5.0, frame_rate=5.0, state_rate=5.0,
                             image_size=size, seed=3)
    report = run_replay(rt, seq, train_every_state=1)
    assert report.frames_processed > 5
    assert report.train_steps > 0, "GCN online training never stepped"
    assert np.isfinite(report.final_loss) and report.final_loss > 0
    res = report.last_result
    assert res is not None and np.isfinite(np.asarray(res.traversability)).all()


@pytest.mark.slow
def test_soak_smoke(tmp_path):
    """CI-scale soak (VERDICT r3 #3): a few hundred frames through the
    full online loop must show ZERO post-warmup recompiles (the Q-padded
    supervision flush — a varying scan length used to recompile when the
    ring buffer first wrapped), bounded host RSS, a flat live-device-array
    census, and a stable frame rate. The production-shape run is
    tools/soak.py -> results/soak_r04.json."""
    import json
    import os
    import subprocess
    import sys as _sys

    script = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tools", "soak.py")
    out = str(tmp_path / "soak.json")
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    res = subprocess.run(
        [_sys.executable, script, "--frames", "500", "--size", "64", "--window", "100",
         "--pool", "6", "--warmup_windows", "2", "--out", out],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-2000:]
    data = json.load(open(out))
    assert data["ok_no_recompiles"], f"post-warmup recompiles: {data['post_warmup_recompiles']}"
    assert data["host_bound_mode"] == "rss"  # CPU backend: raw RSS is the enforced bound
    assert data["ok_host_bounded"] and data["ok_device_bounded"] and data["ok_rate_stable"], data
    assert data["train_steps"] > 50 and data["supervision_updates"] > 50

"""Process-separated deployment: the two-node topology of the reference.

While the flagship topology is the single-process WVNRuntime (two
jitted programs, zero-copy hot swap), deployments that must isolate
inference from learning (e.g. different machines, watchdog restarts —
the reference's reason for two ROS nodes) get the same split here:

  * FeatureExtractorNode (reference wvn_feature_extractor_node.py:37-464):
    camera frames in -> traversability/confidence out + ImageFeatures
    published over a transport; polls the hot-swap checkpoint file at
    `load_save_checkpoint_rate`, detecting changes by file mtime+step
    (the reference compares the last state-dict key, :426-437).
  * LearningNode (reference wvn_learning_node.py:51-966): RobotState +
    ImageFeatures in -> supervision graph + training; atomically writes
    the hot-swap state (write-tmp-then-rename, like the reference's
    remove-then-save at :391-393) and serves checkpoint requests.

Both are pump-style objects (explicit .step()/.spin_once()) so they can
be driven by tests, a rosbag-style replay, or a real rospy shim.
"""

from __future__ import annotations

import os
import pickle
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..cfg import ExperimentParams, FeatureExtractorNodeParams, LearningNodeParams
from ..feature_extractor import FeatureExtractor
from ..models import get_model
from ..ops.projection import scale_intrinsics
from ..ops.resize import resize_image
from ..utils.confidence_generator import (
    ConfidenceConfig,
    confidence_init,
    confidence_inference,
    confidence_load_state_dict,
)
from .msgs import ImageFeatures, SystemStateMsg
from .runtime import WVNRuntime
from .scheduler import Scheduler

HOT_SWAP_FILENAME = ".tmp_state_dict.msgpack"


def write_hot_swap_state(folder: str, params, cg_state_dict: dict, step: int) -> str:
    """Atomic write (tmp + rename) of the hot-swap payload — the
    reference's `.tmp_state_dict.pt` (wvn_learning_node.py:382-394)."""
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, HOT_SWAP_FILENAME)
    tmp = path + ".writing"
    payload = {
        "params": serialization.to_bytes(params),
        "confidence_generator": {k: np.asarray(v) for k, v in cg_state_dict.items()},
        "step": step,
    }
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)
    return path


def read_hot_swap_state(folder: str, params_template):
    path = os.path.join(folder, HOT_SWAP_FILENAME)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = serialization.from_bytes(params_template, payload["params"])
    return params, payload["confidence_generator"], payload["step"]


class FeatureExtractorNode:
    """Inference-process node. Wire `publish_features` to a transport
    publisher; call `image_callback` per camera frame; call
    `maybe_reload_weights` at the checkpoint rate."""

    def __init__(
        self,
        params: Optional[FeatureExtractorNodeParams] = None,
        exp_params: Optional[ExperimentParams] = None,
        hot_swap_folder: str = "/tmp/wvn_mission",
        publish_features: Optional[Callable[[bytes], None]] = None,
        key: Optional[jax.Array] = None,
        backbone_params=None,
    ):
        self.params = params or FeatureExtractorNodeParams()
        self.exp = exp_params or ExperimentParams()
        self._hot_swap_folder = hot_swap_folder
        self._publish_features = publish_features
        key = key if key is not None else jax.random.PRNGKey(0)

        p = self.params
        self._H, self._W = p.network_input_image_height, p.network_input_image_width
        self.feature_extractor = FeatureExtractor(
            key=key,
            segmentation_type=p.segmentation_type,
            feature_type=p.feature_type,
            input_size=self._H,
            patch_size=p.dino_patch_size,
            backbone_type=p.dino_backbone,
            slic_num_components=p.slic_num_components,
            cell_size=p.grid_cell_size,
            backbone_params=backbone_params,
            quant=p.dino_quant,
        )
        D = self.feature_extractor.feature_dim
        self._S = self.feature_extractor.num_segments(self._H, self._W)
        # Same runtime input_size patching as WVNRuntime (reference
        # wvn_learning_node.py:309-315), via the registry's snake-case
        # cfg key — not hardcoded to SimpleMLP.
        model_name = self.exp.model.name
        snake = {"SimpleMLP": "simple_mlp_cfg", "DoubleMLP": "double_mlp_cfg",
                 "SimpleGCN": "simple_gcn_cfg", "LinearRnvp": "linear_rnvp_cfg"}
        if model_name == "SimpleGCN":
            # The process-separated inference node scores features without
            # segment adjacency (ImageFeatures carries no edges) — the GCN
            # needs the single-process WVNRuntime.
            raise ValueError(
                "FeatureExtractorNode does not support SimpleGCN (no edge "
                "transport in ImageFeatures); use WVNRuntime instead."
            )
        self._anomaly = model_name == "LinearRnvp"
        model_cfg = self.exp.model.to_dict()
        model_cfg[snake[model_name]]["input_size"] = D
        self.model = get_model(model_cfg)
        self.model_params = self.model.init(jax.random.fold_in(key, 7), jnp.zeros((1, D)))
        self.cg_state = confidence_init()
        self.cg_cfg = ConfidenceConfig(std_factor=p.confidence_std_factor)
        self._loaded_step = -1
        self.scheduler = Scheduler()
        for cam, cfg in p.camera_topics.items():
            self.scheduler.add_process(cam, int(cfg.get("scheduler_weight", 1)))
        self._last_ts: Dict[str, float] = {}

        anomaly = self._anomaly

        def _score(params, cg_state, x):
            """(N, D) features -> (N,) trav, (N,) confidence; branches on
            the model's output contract like WVNRuntime._build_jitted."""
            out = self.model.apply(params, x)
            if anomaly:
                losses = jnp.sum(out["logprob"], axis=-1) + out["log_det"]
                trav = confidence_inference(self.cg_cfg, cg_state, -losses)
                conf = jnp.ones_like(trav)
            else:
                trav = out[:, 0]
                reco = jnp.mean((out[:, 1:] - x) ** 2, axis=-1)
                conf = confidence_inference(self.cg_cfg, cg_state, reco)
            return trav, conf

        @jax.jit
        def _predict_dense(params, cg_state, dense_feat):
            Dd, Hh, Ww = dense_feat.shape
            x = dense_feat.reshape(Dd, -1).T
            trav, conf = _score(params, cg_state, x)
            return trav.reshape(Hh, Ww), conf.reshape(Hh, Ww)

        @jax.jit
        def _predict_seg(params, cg_state, feat, seg):
            trav, conf = _score(params, cg_state, feat)
            sid = seg.clip(0, feat.shape[0] - 1)
            return trav[sid], conf[sid]

        self._predict_dense = _predict_dense
        self._predict_seg = _predict_seg

    def maybe_reload_weights(self) -> bool:
        """Poll the hot-swap file; reload when the learner's step moved
        (reference load_model, wvn_feature_extractor_node.py:407-450)."""
        out = read_hot_swap_state(self._hot_swap_folder, self.model_params)
        if out is None:
            return False
        params, cg_dict, step = out
        if step == self._loaded_step:
            return False
        self.model_params = params
        self.cg_state = confidence_load_state_dict(self.cg_state, cg_dict)
        self._loaded_step = step
        return True

    def image_callback(self, img, stamp: float, camera: str, K, orig_h: int, orig_w: int,
                       pose_base_in_world=None, pose_cam_in_base=None):
        last = self._last_ts.get(camera)
        if last is not None and (stamp - last) < 1.0 / self.params.image_callback_rate:
            return None
        if self.scheduler.get() != camera:
            self.scheduler.step()
            return None
        self.scheduler.step()
        self._last_ts[camera] = stamp

        img = jnp.asarray(img)[None]
        img_r = resize_image(img, self._H, None if self._H == self._W else self._W)
        ex = self.feature_extractor.extract(img_r, return_dense_features=self.params.prediction_per_pixel)
        if self.params.prediction_per_pixel and ex.dense_features is not None:
            trav, conf = self._predict_dense(self.model_params, self.cg_state, ex.dense_features)
        else:
            trav, conf = self._predict_seg(self.model_params, self.cg_state, ex.features, ex.segments)

        if self._publish_features is not None and ex.features is not None:
            # new_w matters: without it a rectangular config takes the
            # square-center-crop intrinsics branch and ships fy/cy in
            # the fx/cx slots — supervision would reproject onto the
            # wrong pixels (the single-process _scale_K_cached passes
            # it the same way)
            K_scaled = scale_intrinsics(
                jnp.asarray(K)[None], orig_h, orig_w, new_h=self._H,
                new_w=None if self._W == self._H else self._W,
            )[0]
            msg = ImageFeatures(
                stamp=stamp,
                camera=camera,
                segments=np.asarray(ex.segments, np.int32),
                features=np.asarray(ex.features, np.float32),
                feat_valid=np.asarray(ex.center_valid) if ex.center_valid.shape[0] == ex.features.shape[0]
                else np.ones(ex.features.shape[0], bool),
                K_scaled=np.asarray(K_scaled, np.float32),
                pose_base_in_world=np.asarray(pose_base_in_world if pose_base_in_world is not None else np.eye(4)),
                pose_cam_in_base=np.asarray(pose_cam_in_base if pose_cam_in_base is not None else np.eye(4)),
            )
            self._publish_features(msg.pack())
        return np.asarray(trav), np.asarray(conf)


class LearningNode:
    """Learning-process node: wraps WVNRuntime's estimator side, fed by
    transports, emitting the hot-swap file + SystemState."""

    def __init__(
        self,
        fe_params: Optional[FeatureExtractorNodeParams] = None,
        ln_params: Optional[LearningNodeParams] = None,
        exp_params: Optional[ExperimentParams] = None,
        hot_swap_folder: str = "/tmp/wvn_mission",
        publish_system_state: Optional[Callable[[bytes], None]] = None,
        key: Optional[jax.Array] = None,
    ):
        # Reuse the single-process runtime internals minus the feature
        # extractor (features arrive via ImageFeatures — a resident
        # backbone here would be dead HBM weight).
        self.runtime = WVNRuntime(fe_params=fe_params, ln_params=ln_params,
                                  exp_params=exp_params, key=key,
                                  build_feature_extractor=False)
        self._hot_swap_folder = hot_swap_folder
        self._publish_system_state = publish_system_state
        self._last_saved_step = -1
        # startup: delete stale hot-swap file (reference wvn_learning_node.py:953-955)
        stale = os.path.join(hot_swap_folder, HOT_SWAP_FILENAME)
        if os.path.exists(stale):
            os.unlink(stale)

    def imagefeat_callback(self, payload: bytes) -> bool:
        """Deserialize ImageFeatures and insert the mission node
        (reference imagefeat_callback, wvn_learning_node.py:550-688)."""
        from ..traversability import MissionNode

        msg = ImageFeatures.unpack(payload)
        node = MissionNode(
            timestamp=msg.stamp,
            pose_base_in_world=msg.pose_base_in_world,
            pose_cam_in_base=msg.pose_cam_in_base,
            camera_name=msg.camera,
            # honor the camera config like the single-process runtime
            # (_make_mission_node): use_for_training=False cameras must
            # not feed the training buffer in this topology either
            use_for_training=self.runtime.fe_params.camera_topics.get(
                msg.camera, {}
            ).get("use_for_training", True),
        )
        return self.runtime.estimator.add_mission_node(
            node,
            jnp.asarray(msg.features),
            jnp.asarray(msg.feat_valid),
            jnp.asarray(msg.segments),
            jnp.asarray(msg.K_scaled),
        )

    def robot_state_callback(self, stamp, pose_base_in_world, current_twist, desired_twist) -> bool:
        return self.runtime.robot_state_callback(stamp, pose_base_in_world, current_twist, desired_twist)

    def learning_step(self):
        st = self.runtime.learning_step()
        est = self.runtime.estimator
        swap_every = max(1, int(self.runtime.ln_params.learning_thread_rate /
                                self.runtime.ln_params.load_save_checkpoint_rate))
        if est.step != self._last_saved_step and est.step % swap_every == 0 and est.step > 0:
            from ..utils.confidence_generator import confidence_state_dict

            write_hot_swap_state(self._hot_swap_folder, est.params,
                                 confidence_state_dict(est.confidence_state), est.step)
            self._last_saved_step = est.step
        if self._publish_system_state is not None:
            self._publish_system_state(
                SystemStateMsg(
                    mode=1,
                    mission_graph_num_valid_node=st.mission_graph_num_valid_node,
                    step=st.step,
                    loss_total=st.loss_total,
                    loss_trav=st.loss_trav,
                    loss_reco=st.loss_reco,
                    pause_learning=st.pause_learning,
                ).pack()
            )
        return st

    # Services (reference wvn_learning_node.py:844-914)
    def save_checkpoint(self, mission_path: str, name: str = "last_checkpoint.ckpt"):
        return self.runtime.save_checkpoint(mission_path, name)

    def load_checkpoint(self, path: str):
        self.runtime.load_checkpoint(path)

    def pause(self, pause: bool):
        self.runtime.pause_learning(pause)

    def reset(self):
        self.runtime.reset()

    def shutdown(self, mission_path: str) -> str:
        """Graceful shutdown: final mission checkpoint + a last hot-swap
        write so a restarting inference node rejoins at the latest
        weights (reference wvn_learning_node.py:148-174)."""
        from ..utils.confidence_generator import confidence_state_dict

        est = self.runtime.estimator
        write_hot_swap_state(self._hot_swap_folder, est.params,
                             confidence_state_dict(est.confidence_state), est.step)
        return self.runtime.shutdown(mission_path)

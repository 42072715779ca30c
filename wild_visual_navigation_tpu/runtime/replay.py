"""Replay harness: stream recorded/synthetic (image, pose, twist)
sequences through the full online loop without a robot or ROS.

The reference's equivalent is rosbag replay + the Gazebo Jackal sim
(SURVEY.md §4); this harness is the in-repo, deterministic version:
a `Sequence` of timestamped frames and state samples is pumped through
WVNRuntime callbacks in timestamp order at virtual time (no sleeps).
`synthetic_sequence` builds a robot driving over a textured ground
plane with a traversable corridor and an obstacle region where velocity
tracking degrades — enough structure for the online loop to learn a
nontrivial traversability signal end-to-end (BASELINE config 4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator, List, Optional, Tuple

import numpy as np

from .runtime import InferenceResult, WVNRuntime


@dataclass
class CameraFrame:
    stamp: float
    camera: str
    image: np.ndarray  # (3, H, W) [0,1]
    K: np.ndarray  # (3, 3)
    pose_base_in_world: np.ndarray
    pose_cam_in_base: np.ndarray


@dataclass
class StateSample:
    stamp: float
    pose_base_in_world: np.ndarray
    current_twist: np.ndarray  # (6,)
    desired_twist: np.ndarray  # (6,)


@dataclass
class Sequence:
    frames: List[CameraFrame] = field(default_factory=list)
    states: List[StateSample] = field(default_factory=list)

    def events(self) -> Iterator[Tuple[float, str, object]]:
        evs = [(f.stamp, "frame", f) for f in self.frames] + [(s.stamp, "state", s) for s in self.states]
        return iter(sorted(evs, key=lambda e: e[0]))


def _ground_texture(rng: np.random.RandomState, size: int = 256) -> np.ndarray:
    """Smooth random texture (3, size, size) for the world floor."""
    tex = rng.rand(3, size // 8, size // 8).astype(np.float32)
    tex = tex.repeat(8, axis=1).repeat(8, axis=2)
    # cheap blur
    for _ in range(2):
        tex = 0.25 * (np.roll(tex, 1, 1) + np.roll(tex, -1, 1) + np.roll(tex, 1, 2) + np.roll(tex, -1, 2))
    return tex


def synthetic_sequence(
    duration: float = 8.0,
    frame_rate: float = 10.0,
    state_rate: float = 10.0,
    image_size: int = 224,
    seed: int = 0,
    obstacle_x: Optional[float] = None,
) -> Sequence:
    """Robot drives along +x at 1 m/s over a textured plane; a green-ish
    corridor is traversable, an optional obstacle band at `obstacle_x`
    causes velocity-tracking failure (untraversable supervision)."""
    rng = np.random.RandomState(seed)
    tex = _ground_texture(rng)
    H = W = image_size
    K = np.array([[0.6 * W, 0, W / 2], [0, 0.6 * W, H / 2], [0, 0, 1.0]])
    # camera 1.2m up, pitched down 45 deg, looking forward (+x)
    pitch = np.deg2rad(45)
    R_pitch = np.array(
        [
            [0, -np.sin(pitch), np.cos(pitch)],
            [-1, 0, 0],
            [0, -np.cos(pitch), -np.sin(pitch)],
        ]
    ).T
    pose_cam_in_base = np.eye(4)
    pose_cam_in_base[:3, :3] = R_pitch
    pose_cam_in_base[:3, 3] = [0.3, 0.0, 1.2]

    def render(x_pos: float) -> np.ndarray:
        """Fake perspective render: sample the texture along the ground
        ahead of the robot (rows = depth, cols = lateral)."""
        img = np.zeros((3, H, W), dtype=np.float32)
        depths = 0.8 + 4.0 * (np.arange(H)[::-1] / H) ** 1.5
        for r, d in enumerate(depths):
            wx = x_pos + d
            half = 0.9 * d
            wys = np.linspace(-half, half, W)
            ti = (np.abs(wx * 24) % tex.shape[1]).astype(int)
            tj = (np.abs((wys + 100) * 24) % tex.shape[2]).astype(int)
            img[:, r, :] = tex[:, ti, tj]
        return np.clip(img, 0, 1)

    seq = Sequence()
    base = np.eye(4)
    n_frames = int(duration * frame_rate)
    for i in range(n_frames):
        t = i / frame_rate
        x = t * 1.0
        pose = base.copy()
        pose[0, 3] = x
        seq.frames.append(
            CameraFrame(
                stamp=t, camera="front", image=render(x), K=K, pose_base_in_world=pose,
                pose_cam_in_base=pose_cam_in_base,
            )
        )
    n_states = int(duration * state_rate)
    for i in range(n_states):
        t = i / state_rate
        x = t * 1.0
        pose = base.copy()
        pose[0, 3] = x
        desired = np.array([1.0, 0, 0, 0, 0, 0])
        current = desired + rng.randn(6) * 0.03
        if obstacle_x is not None and abs(x - obstacle_x) < 0.5:
            current = desired * 0.1  # robot stuck -> tracking failure
        seq.states.append(
            StateSample(stamp=t + 0.01, pose_base_in_world=pose, current_twist=current, desired_twist=desired)
        )
    return seq


def save_sequence(seq: Sequence, path: str) -> str:
    """Persist a sequence as one npz — the framework's 'rosbag': record
    once (from a robot shim or the synthetic generator), replay
    deterministically forever."""
    np.savez_compressed(
        path,
        frame_stamps=np.array([f.stamp for f in seq.frames]),
        frame_cameras=np.array([f.camera for f in seq.frames]),
        frame_images=np.stack([f.image for f in seq.frames]) if seq.frames else np.zeros((0,)),
        frame_K=np.stack([f.K for f in seq.frames]) if seq.frames else np.zeros((0,)),
        frame_pose=np.stack([f.pose_base_in_world for f in seq.frames]) if seq.frames else np.zeros((0,)),
        frame_cam_in_base=np.stack([f.pose_cam_in_base for f in seq.frames]) if seq.frames else np.zeros((0,)),
        state_stamps=np.array([s.stamp for s in seq.states]),
        state_pose=np.stack([s.pose_base_in_world for s in seq.states]) if seq.states else np.zeros((0,)),
        state_twist=np.stack([s.current_twist for s in seq.states]) if seq.states else np.zeros((0,)),
        state_desired=np.stack([s.desired_twist for s in seq.states]) if seq.states else np.zeros((0,)),
    )
    return path


def load_sequence(path: str) -> Sequence:
    d = np.load(path, allow_pickle=False)
    seq = Sequence()
    for i in range(len(d["frame_stamps"])):
        seq.frames.append(CameraFrame(
            stamp=float(d["frame_stamps"][i]), camera=str(d["frame_cameras"][i]),
            image=d["frame_images"][i], K=d["frame_K"][i],
            pose_base_in_world=d["frame_pose"][i], pose_cam_in_base=d["frame_cam_in_base"][i],
        ))
    for i in range(len(d["state_stamps"])):
        seq.states.append(StateSample(
            stamp=float(d["state_stamps"][i]), pose_base_in_world=d["state_pose"][i],
            current_twist=d["state_twist"][i], desired_twist=d["state_desired"][i],
        ))
    return seq


@dataclass
class ReplayReport:
    frames_processed: int = 0
    frames_gated: int = 0
    supervision_updates: int = 0
    train_steps: int = 0
    final_loss: float = float("inf")
    valid_nodes: int = 0
    last_result: Optional[InferenceResult] = None


def run_replay(
    runtime: WVNRuntime,
    sequence: Sequence,
    train_every_state: int = 1,
    verbose: bool = False,
) -> ReplayReport:
    """Pump the sequence through the runtime in timestamp order,
    interleaving learning steps like the reference's learning thread
    (at the supervision rate times `train_every_state`)."""
    report = ReplayReport()
    for stamp, kind, payload in sequence.events():
        if kind == "frame":
            f: CameraFrame = payload
            res = runtime.image_callback(
                f.image, f.stamp, f.camera, f.K, f.image.shape[1], f.image.shape[2],
                f.pose_base_in_world, f.pose_cam_in_base,
            )
            if res is None:
                report.frames_gated += 1
            else:
                report.frames_processed += 1
                report.last_result = res
        else:
            s: StateSample = payload
            if runtime.robot_state_callback(s.stamp, s.pose_base_in_world, s.current_twist, s.desired_twist):
                report.supervision_updates += 1
            for _ in range(train_every_state):
                st = runtime.learning_step()
                if st.loss_total > 0:
                    report.train_steps += 1
                    report.final_loss = st.loss_total
    report.valid_nodes = runtime.estimator.get_num_valid_nodes()
    if verbose:
        print(report)
    return report

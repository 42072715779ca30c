"""Multi-process CPU dryrun: the product estimator trained globally.

Spawns N jax processes (one per simulated camera group), each with its
own virtual CPU devices, joined into ONE global ("dp",) mesh via
jax.distributed + Gloo collectives. Every process:

  1. builds the PRODUCT TraversabilityEstimator (tiny shapes), ingests
     its own camera group's mission nodes and supervision footprints
     locally (graph gating + reprojection on local devices);
  2. joins collective `DistributedTrainer.step()` calls — the
     estimator's own `_train_step_on_batch` over the global dp-sharded
     sample rows (grad psum spans processes);
  3. syncs the replicated params back and prints a params checksum.

The parent verifies all ranks exit 0 and print the SAME checksum (the
replicated state stayed consistent across hosts). This is the
multi-host story SURVEY §2.4 asks for, validated without real hosts.

--runtime runs the FULL PRODUCT RUNTIME per rank instead of bare
estimators (VERDICT r3 #6): each process pumps its own synthetic
camera sequence through WVNRuntime (image callbacks, rate gates,
supervision reprojection, hot-swap cadence) with
attach_distributed_trainer, so every learning tick is the collective
global step. The parent asserts rank-identical param checksums AND
per-rank inference liveness (a post-training frame must produce a
finite traversability map from the swapped params).

Usage: python tools/dryrun_multiprocess.py [--procs 2] [--devices 4]
                                           [--runtime]
Exit code 0 = OK. Also spawned by __graft_entry__.dryrun_multichip and
tests/test_parallel.py.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def child(rank: int, procs: int, devices: int, coord: str) -> None:
    from wild_visual_navigation_tpu.parallel.distributed import (
        DistributedTrainer,
        initialize_process,
    )

    initialize_process(coord, procs, rank, cpu_devices=devices)

    import jax
    import numpy as np

    assert len(jax.local_devices()) == devices
    assert len(jax.devices()) == procs * devices
    print(f"[rank {rank}] local={devices} global={len(jax.devices())}", flush=True)

    from wild_visual_navigation_tpu.traversability import (
        MissionNode,
        SupervisionNode,
        TraversabilityEstimator,
    )

    S, D, H = 16, 32, 32
    est = TraversabilityEstimator(
        model_cfg={"name": "SimpleMLP",
                   "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [64, 1], "reconstruction": True}},
        num_segments=S, feature_dim=D, image_height=H, image_width=H,
        buffer_capacity=16, reprojection_fanout=8, batch_size=4,
        min_samples_for_training=2, seed=42,  # same seed -> identical init across ranks
    )

    # Per-rank camera-group data: disjoint trajectories.
    rng = np.random.RandomState(100 + rank)
    K = np.array([[40.0, 0, H / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
    down = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
    for i in range(6):
        pose = np.eye(4)
        pose[0, 3] = i * 0.5
        pose[1, 3] = 10.0 * rank
        pose[2, 3] = 1.5
        pose[:3, :3] = down
        node = MissionNode(timestamp=float(i), pose_base_in_world=pose,
                           pose_cam_in_base=np.eye(4), camera_name=f"cam{rank}")
        est.add_mission_node(node, rng.randn(S, D).astype(np.float32), np.ones(S, bool),
                             (np.arange(H * H) % S).reshape(H, H).astype(np.int32), K)
    for i in range(8):
        pose = np.eye(4)
        pose[0, 3] = i * 0.3
        pose[1, 3] = 10.0 * rank
        sn = SupervisionNode(
            timestamp=float(i) + 0.1, pose_base_in_world=pose, pose_footprint_in_base=np.eye(4),
            twist_in_base=np.array([0.5, 0, 0, 0, 0, 0.0]),
            desired_twist_in_base=np.array([0.5, 0, 0, 0, 0, 0.0]),
            length=0.8, width=0.4, height=0.2,
            traversability=0.8, traversability_var=0.1, is_untraversable=False,
        )
        est.add_supervision_node(sn)

    trainer = DistributedTrainer(est)
    np.random.seed(7 + rank)  # rank-dependent local sampling is fine — rows are per-process
    last = {}
    for _ in range(5):
        last = trainer.step()
    trainer.sync_to_estimator()
    assert np.isfinite(last["loss_total"]), last
    assert est.step == 5

    # Phase 2 — starvation: a camera group with NO trainable data yet
    # must still join the collective step (it contributes fully-masked
    # rows) without deadlocking the fleet, and the replicated state
    # must stay consistent.
    est2 = TraversabilityEstimator(
        model_cfg={"name": "SimpleMLP",
                   "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [64, 1], "reconstruction": True}},
        num_segments=S, feature_dim=D, image_height=H, image_width=H,
        buffer_capacity=16, reprojection_fanout=8, batch_size=4,
        min_samples_for_training=2, seed=43,
    )
    if rank == 0:  # only rank 0 has data; other ranks are starved
        for i in range(6):
            pose = np.eye(4)
            pose[0, 3] = i * 0.5
            pose[2, 3] = 1.5
            pose[:3, :3] = down
            node = MissionNode(timestamp=float(i), pose_base_in_world=pose,
                               pose_cam_in_base=np.eye(4), camera_name="cam0")
            est2.add_mission_node(node, rng.randn(S, D).astype(np.float32), np.ones(S, bool),
                                  (np.arange(H * H) % S).reshape(H, H).astype(np.int32), K)
        for i in range(8):
            pose = np.eye(4)
            pose[0, 3] = i * 0.3
            est2.add_supervision_node(SupervisionNode(
                timestamp=float(i) + 0.1, pose_base_in_world=pose, pose_footprint_in_base=np.eye(4),
                twist_in_base=np.array([0.5, 0, 0, 0, 0, 0.0]),
                desired_twist_in_base=np.array([0.5, 0, 0, 0, 0, 0.0]),
                length=0.8, width=0.4, height=0.2,
                traversability=0.8, traversability_var=0.1, is_untraversable=False,
            ))
    trainer2 = DistributedTrainer(est2)
    for _ in range(3):
        last2 = trainer2.step()
    trainer2.sync_to_estimator()
    assert np.isfinite(last2["loss_total"]), last2
    checksum2 = float(sum(np.abs(np.asarray(l)).sum() for l in jax.tree_util.tree_leaves(est2.params)))

    checksum = float(sum(np.abs(np.asarray(l)).sum() for l in jax.tree_util.tree_leaves(est.params)))
    print(f"[rank {rank}] DISTRIBUTED OK loss={last['loss_total']:.6f} "
          f"checksum={checksum:.8f} starved_checksum={checksum2:.8f}", flush=True)


def runtime_child(rank: int, procs: int, devices: int, coord: str, tp: int = 1) -> None:
    """One camera group's FULL runtime loop under jax.distributed: the
    per-process online system (callbacks, scheduler gates, supervision,
    hot-swap cadence) with its learning ticks joined into the global
    collective train step. tp > 1 runs the collective step on a
    ("dp", "tp") mesh — the head's Dense kernels Megatron-split over
    tp — so head sharding rides the full runtime loop (VERDICT r4 #6);
    the checksum assertion then also covers the tp re-gather path."""
    from wild_visual_navigation_tpu.parallel.distributed import initialize_process

    initialize_process(coord, procs, rank, cpu_devices=devices)

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
        load_save_checkpoint_rate=2.0,  # hot-swap every ~5 learning ticks
    )
    exp = ExperimentParams()
    exp.model.simple_mlp_cfg.hidden_sizes = [32, 1]
    # identical seed -> identical init across ranks (DistributedTrainer
    # promotes local state to replicated global arrays)
    rt = WVNRuntime(fe_params=fe, ln_params=ln, exp_params=exp,
                    key=jax.random.PRNGKey(0), buffer_capacity=32, reprojection_fanout=8)
    rt.attach_distributed_trainer(tp=tp)

    # Per-rank camera sequence (different world texture/noise, same
    # event cadence -> every rank reaches learning ticks in lockstep;
    # the ticks are collective).
    seq = synthetic_sequence(duration=4.0, frame_rate=5.0, state_rate=5.0,
                             image_size=size, seed=100 + rank)
    report = run_replay(rt, seq, train_every_state=1)
    assert report.frames_processed > 3, f"rank {rank}: runtime processed too few frames"
    assert rt._dist_trainer.step_count >= 15, rt._dist_trainer.step_count

    rt.hot_swap()  # sync the replicated params into the local estimator + mailbox

    # inference liveness from the swapped params: one more frame through
    # the product image path must yield a finite traversability map
    frame = seq.frames[-1]
    res = rt.image_callback(frame.image, frame.stamp + 100.0, frame.camera, frame.K,
                            frame.image.shape[1], frame.image.shape[2],
                            frame.pose_base_in_world, frame.pose_cam_in_base)
    assert res is not None, f"rank {rank}: post-training frame was gated"
    trav = np.asarray(res.traversability)
    assert np.isfinite(trav).all() and trav.shape == (size, size)

    mesh_axes = tuple(rt._dist_trainer._mesh.axis_names)
    checksum = float(sum(np.abs(np.asarray(l)).sum()
                         for l in jax.tree_util.tree_leaves(rt.estimator.params)))
    print(f"[rank {rank}] RUNTIME OK steps={rt._dist_trainer.step_count} "
          f"frames={report.frames_processed} loss={report.final_loss:.6f} "
          f"mesh={mesh_axes} tp={tp} "
          f"checksum={checksum:.8f}", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--devices", type=int, default=4, help="virtual CPU devices per process")
    ap.add_argument("--timeout", type=float, default=240.0)
    ap.add_argument("--runtime", action="store_true",
                    help="drive the full WVNRuntime per rank instead of bare estimators")
    ap.add_argument("--tp", type=int, default=1,
                    help="(--runtime) tensor-parallel degree: the collective train "
                         "step runs on a (dp, tp) mesh with the head Megatron-split")
    ap.add_argument("--rank", type=int, default=None, help="(internal) run as this child rank")
    ap.add_argument("--coord", type=str, default=None)
    args = ap.parse_args()

    if args.rank is not None:
        if args.runtime:
            runtime_child(args.rank, args.procs, args.devices, args.coord, tp=args.tp)
        else:
            child(args.rank, args.procs, args.devices, args.coord)
        return 0

    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    marker = "RUNTIME OK" if args.runtime else "DISTRIBUTED OK"
    procs = []
    for rank in range(args.procs):
        procs.append(subprocess.Popen(
            [sys.executable, __file__, "--rank", str(rank), "--procs", str(args.procs),
             "--devices", str(args.devices), "--coord", coord]
            + (["--runtime", "--tp", str(args.tp)] if args.runtime else []),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs, rcs = [], []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
        rcs.append(p.returncode)

    checksums = []
    for rank, (rc, out) in enumerate(zip(rcs, outs)):
        ok_lines = [l for l in out.splitlines() if marker in l]
        if rc != 0 or not ok_lines:
            print(f"--- rank {rank} FAILED (rc={rc}) ---\n{out[-3000:]}")
            return 1
        checksums.append(ok_lines[0].split("checksum=", 1)[1])  # both checksums
        print(ok_lines[0])
    if len(set(checksums)) != 1:
        print(f"checksum mismatch across ranks: {checksums}")
        return 1
    mode = "runtime" if args.runtime else "estimator"
    print(f"multiprocess {mode} dryrun OK: {args.procs} procs x {args.devices} devices, "
          "replicated state consistent")
    return 0


if __name__ == "__main__":
    sys.exit(main())

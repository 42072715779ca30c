"""Subprocess body for test_wvnruntime_mesh_matches_single_device.

Run standalone (fresh interpreter): builds WVNRuntime with and without
a (dp=4, tp=2) mesh on the virtual 8-device CPU mesh and asserts the
full online loop matches. Lives outside the pytest process because on
some hosts XLA:CPU crashes the interpreter ("Fatal Python error", no
traceback) when this workload runs after ~100 prior compilations in
the same process — standalone it is reliable everywhere we have run it.
Exit code 0 = match.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402

from wild_visual_navigation_tpu.cfg import (  # noqa: E402
    FeatureExtractorNodeParams,
    LearningNodeParams,
)
from wild_visual_navigation_tpu.parallel import create_mesh  # noqa: E402
from wild_visual_navigation_tpu.runtime import WVNRuntime  # noqa: E402


def build(mesh):
    fe = FeatureExtractorNodeParams(
        network_input_image_height=32,
        network_input_image_width=32,
        segmentation_type="grid",
        feature_type="dino",
        dino_backbone="vit_small",
        dino_patch_size=8,
        image_callback_rate=1000.0,
        camera_topics={f"cam{i}": {"use_for_training": True} for i in range(4)},
    )
    fe.grid_cell_size = 8
    ln = LearningNodeParams(
        min_samples_for_training=2,
        image_graph_dist_thr=0.01,
        supervision_graph_dist_thr=0.01,
        supervision_callback_rate=1000.0,
    )
    return WVNRuntime(fe_params=fe, ln_params=ln, key=jax.random.PRNGKey(0),
                      buffer_capacity=16, reprojection_fanout=4, mesh=mesh)


def main() -> int:
    mesh = create_mesh(8, dp=4, tp=2)
    rts = {"single": build(None), "meshed": build(mesh)}

    rng = np.random.RandomState(0)
    imgs = rng.rand(4, 3, 40, 40).astype(np.float32)
    Ks = np.tile(np.array([[30.0, 0, 20], [0, 30, 20], [0, 0, 1]], np.float32), (4, 1, 1))
    Tc = np.eye(4)
    Tc[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]])  # looking down
    Tc[2, 3] = 2.0

    outs = {}
    for name, rt in rts.items():
        np.random.seed(42)  # estimator batch sampling uses the global RNG
        trav_maps = []
        for step in range(3):
            poses = np.tile(np.eye(4), (4, 1, 1))
            poses[:, 0, 3] = step * 0.5 + np.arange(4) * 0.1
            res = rt.image_batch_callback(
                imgs + step * 0.01, stamps=[step + 0.1 * i for i in range(4)],
                cameras=[f"cam{i}" for i in range(4)], Ks=Ks, orig_h=40, orig_w=40,
                poses_base_in_world=poses, poses_cam_in_base=np.tile(Tc, (4, 1, 1)),
            )
            trav_maps.append(np.asarray(res[0].traversability))
            pT = np.eye(4)
            pT[0, 3] = step * 0.5 + 0.2
            rt.robot_state_callback(step + 0.5, pT, np.array([1.0, 0, 0, 0, 0, 0]),
                                    np.array([1.0, 0, 0, 0, 0, 0]))
        losses = []
        for _ in range(5):
            st = rt.learning_step()
            losses.append(st.loss_total)
        outs[name] = (trav_maps, losses,
                      jax.tree_util.tree_map(np.asarray, rt.estimator.params))

    # tp-sharded bf16 matmuls legitimately reorder reductions -> bf16-level
    # agreement; a wiring bug (wrong shard, dropped psum) diverges by O(1)
    for a, b in zip(outs["single"][0], outs["meshed"][0]):
        np.testing.assert_allclose(a, b, atol=1e-2)
    np.testing.assert_allclose(outs["single"][1], outs["meshed"][1], rtol=5e-2, atol=5e-3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-2),
        outs["single"][2], outs["meshed"][2],
    )
    assert outs["single"][1][-1] >= 0, "training never ran"
    print("mesh runtime matches single device")
    return 0


if __name__ == "__main__":
    sys.exit(main())

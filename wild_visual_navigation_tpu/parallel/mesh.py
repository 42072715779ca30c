"""Device-mesh parallelism: sharding rules + multi-chip train/infer.

The reference has no multi-device story (SURVEY.md §2.4: two ROS
processes on one GPU); this module is the TPU-native scaling layer:

  * mesh axes ("dp", "tp"): data parallel over frames/batch, tensor
    parallel over the backbone's attention heads / MLP hidden units;
  * shardings are declared with NamedSharding / PartitionSpec and XLA
    inserts the collectives (psum of gradients over dp, all-gathers on
    the tp boundaries) — the scaling-book recipe, no hand-written
    NCCL-style code;
  * works identically on a real pod slice and on the virtual CPU mesh
    (`xla_force_host_platform_device_count`) the tests use.
"""

from __future__ import annotations

from typing import Optional

import jax
import optax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None, tp: Optional[int] = None) -> Mesh:
    """2-D ("dp", "tp") mesh over the first n devices. Default: all
    devices on dp (pure data parallel) unless tp is given."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if dp is None and tp is None:
        dp, tp = n, 1
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != n({n})"
    arr = mesh_utils.create_device_mesh((dp, tp), devices=devices[:n])
    return Mesh(arr, axis_names=("dp", "tp"))


def _dense_layer_index(names) -> Optional[int]:
    for n in names:
        if isinstance(n, str) and n.startswith("Dense_"):
            try:
                return int(n.split("_")[1])
            except ValueError:
                return None
    return None


def mlp_param_spec(params, tp: int = 2):
    """PartitionSpec tree for an MLP head: Megatron-style column/row
    split alternating across Dense layers — layer 2k kernel (in, hid)
    -> P(None, 'tp'), its bias P('tp'); layer 2k+1 kernel (hid, out)
    -> P('tp', None), bias replicated. Dims not divisible by `tp`
    stay replicated."""

    def spec(path, leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        i = _dense_layer_index(names)
        if i is None:
            return P()
        col_split = i % 2 == 0
        if "kernel" in names and leaf.ndim == 2:
            if col_split and leaf.shape[1] % tp == 0:
                return P(None, "tp")
            if not col_split and leaf.shape[0] % tp == 0:
                return P("tp", None)
        if "bias" in names and leaf.ndim == 1 and col_split and leaf.shape[0] % tp == 0:
            return P("tp")
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def vit_param_spec(params, tp: int = 2):
    """PartitionSpec tree for the ViT: attention qkv/out and MLP fc1/fc2
    sharded over 'tp' (head parallelism: qkv column-split, proj
    row-split — zero communication inside attention, one psum after)."""

    def spec(path, leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        joined = "/".join(str(n) for n in names)
        if leaf.ndim == 2:
            if ("qkv" in joined or "fc1" in joined) and leaf.shape[1] % tp == 0:
                return P(None, "tp")
            if ("proj" in joined or "fc2" in joined) and leaf.shape[0] % tp == 0:
                return P("tp", None)
        if leaf.ndim == 1 and "bias" in joined and ("qkv" in joined or "fc1" in joined):
            if leaf.shape[0] % tp == 0:
                return P("tp")
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_pytree(pytree, spec_tree, mesh: Mesh):
    """device_put every leaf with its NamedSharding."""
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)), pytree, spec_tree
    )


def make_multichip_train_step(mesh: Mesh, model, tx, loss_fn):
    """Build a jitted dp+tp train step.

    loss_fn(params, batch_tuple, cg_state) -> (loss, (aux, cg_state2)).
    The batch tuple leaves are sharded over 'dp' on their leading axis;
    params carry whatever NamedSharding they were placed with (XLA
    propagates and inserts the grad psum over dp automatically).
    """
    data_sharding = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def train_step(params, opt_state, cg_state, batch):
        (loss, (aux, cg2)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, cg_state)
        updates, opt2 = tx.update(grads, opt_state)
        params2 = optax.apply_updates(params, updates)
        return params2, opt2, cg2, loss, aux

    def place_batch(batch):
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, data_sharding), batch)

    return train_step, place_batch, repl


def make_multichip_inference(mesh: Mesh, apply_fn):
    """Batched inference sharded over dp: frames split across chips,
    params replicated/tp-sharded. apply_fn(params, imgs) -> outputs."""
    data_sharding = NamedSharding(mesh, P("dp"))

    @jax.jit
    def infer(params, imgs):
        imgs = jax.lax.with_sharding_constraint(imgs, data_sharding)
        return apply_fn(params, imgs)

    return infer

"""Multi-process / multi-host deployment: one process per camera group.

SURVEY §2.4 names the requirement the reference's ROS fabric implies
but never scales: "the comm layer should expose a mesh abstraction so
multi-host fan-out (one host per camera group) is possible". The
TPU-native architecture here:

  * each process runs its own runtime/estimator for INGESTION (feature
    extraction, graph bookkeeping, supervision reprojection) on its
    local devices — per-camera-group work needs no cross-host traffic;
  * the TRAIN step is GLOBAL data-parallel: every process contributes
    its local sample rows, the rows form one dp-sharded global array,
    and all processes collectively execute the estimator's PRODUCT
    train step (`_train_step_on_batch`: confidence-weighted loss ->
    grads -> psum over dp -> Adam). Params / optimizer / confidence
    state live as fully-replicated global arrays, so every camera
    group learns from every group's supervision;
  * at the hot-swap cadence each process writes the replicated params
    back into its local estimator (`sync_to_estimator`) for inference
    and checkpointing.

Collectives ride whatever links the mesh spans — ICI inside a pod
slice, DCN/Gloo across hosts; XLA inserts them from the shardings
(the scaling-book recipe; no hand-written NCCL/MPI).

Validated end-to-end on a multi-process CPU mesh by
tools/dryrun_multiprocess.py (spawned from __graft_entry__ and
tests/test_parallel.py::test_multiprocess_distributed_trainer).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def initialize_process(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    cpu_devices: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with this environment's CPU quirks
    handled: the sitecustomize pre-registers backends, so the local
    CPU device count must be set through jax.config BEFORE the first
    backend touch (XLA_FLAGS alone is ignored)."""
    import jax

    if cpu_devices is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", cpu_devices)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def create_global_mesh(tp: int = 1):
    """Mesh over ALL processes' devices — ("dp",) for tp == 1 (the
    trainer's batch axis; replicated params), or a 2-D ("dp", "tp")
    mesh for tp > 1: batch rows split over dp, the head's Dense layers
    Megatron-split over tp (parallel/mesh.py::mlp_param_spec), so the
    collective train step exercises BOTH gradient psum over dp and the
    tp gathers on the layer boundaries (VERDICT r4 #6). tp must divide
    the per-process device count so each tp group stays intra-host
    (its all-gathers ride local links, not DCN)."""
    import jax
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    n = len(jax.devices())
    if tp <= 1:
        arr = mesh_utils.create_device_mesh((n,))
        return Mesh(arr, axis_names=("dp",))
    assert n % tp == 0, f"tp={tp} must divide global device count {n}"
    n_local = len(jax.local_devices())
    assert n_local % tp == 0, (
        f"tp={tp} must divide the per-process device count {n_local} "
        "(tp groups must not straddle hosts)"
    )
    arr = mesh_utils.create_device_mesh((n // tp, tp))
    return Mesh(arr, axis_names=("dp", "tp"))


def _to_global(x, sharding):
    """Host numpy -> global array with `sharding` (every process calls
    this collectively; for replicated shardings each process must pass
    identical data)."""
    import jax

    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def _to_local(garr) -> np.ndarray:
    """Fully-replicated global array -> host numpy (any addressable
    shard holds the complete value)."""
    return np.asarray(garr.addressable_data(0))


class DistributedTrainer:
    """Global data-parallel trainer over per-process product estimators.

    ALL methods marked collective must be called by every process at
    the same point in its loop (they execute global programs). `step()`
    is safe to call when a process has no trainable data yet — it
    contributes fully-masked rows, which the masked loss reductions
    ignore, so slow camera groups never deadlock the fleet.
    """

    def __init__(self, estimator, mesh=None, tp: int = 1):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..models import model_needs_edges

        self._est = estimator
        self._mesh = mesh or create_global_mesh(tp)
        self._tp = tp
        self._dp = NamedSharding(self._mesh, P("dp"))
        self._repl = NamedSharding(self._mesh, P())
        # Promote the local optimization state to global arrays
        # (collective). All processes start from the same seed, so the
        # local copies are identical by construction; a loaded
        # checkpoint must be loaded by every process before this.
        # tp > 1: the head's Dense kernels are Megatron-split over the
        # mesh's tp axis (mlp_param_spec); everything else — optimizer
        # moments included — stays replicated, and XLA inserts the
        # gathers where the two shardings meet. Numerics are unchanged
        # (grad psum over dp, identical updates on every tp shard's
        # replicated view).
        to_repl = lambda t: jax.tree_util.tree_map(lambda l: _to_global(l, self._repl), t)
        if tp > 1:
            from .mesh import mlp_param_spec

            spec_tree = mlp_param_spec(estimator.params, tp=tp)
            self._params = jax.tree_util.tree_map(
                lambda l, s: _to_global(l, NamedSharding(self._mesh, s)),
                estimator.params, spec_tree,
            )
        else:
            self._params = to_repl(estimator.params)
        self._opt_state = to_repl(estimator._opt_state)
        self._cg_state = type(estimator.confidence_state)(
            *[_to_global(l, self._repl) for l in estimator.confidence_state]
        )
        self._step = estimator.step
        self._rows = estimator._batch_size * estimator._S
        self._D = estimator._D
        # Graph heads (SimpleGCN): rows stay dp-sharded, and each
        # process additionally contributes its nodes' segment adjacency
        # (recomputed locally from the stored segmentation, exactly as
        # the single-process _train_step does, estimator.py:364-373);
        # the node axis is dp-sharded alongside the rows.
        self._gcn = model_needs_edges(estimator.model)
        if self._gcn:
            import jax.numpy as jnp

            from ..ops.segment_ops import adjacency_list

            S, E = estimator._S, estimator._max_edges
            self._E = E

            @jax.jit
            def _local_adjacency(seg):
                return jax.vmap(lambda s: adjacency_list(s, S, max_edges=E))(seg)

            self._local_adjacency = _local_adjacency

    @property
    def step_count(self) -> int:
        return self._step

    def _local_rows(self):
        """Sample this process's contribution: (rows, D) features,
        (rows,) labels / label-valid / sample-valid. All-masked when
        no local data is trainable yet."""
        import jax.numpy as jnp

        est = self._est
        # mirror estimator.train()'s amortized resolve cadence: the
        # pending-supervision resolution is a device-queue-draining D2H
        # readback, so pay it every supervision_resolve_every steps (or
        # while too few nodes are valid), not on every collective step
        est._train_calls += 1
        if (
            est._train_calls % est._resolve_every == 0
            or est._mission_graph.get_num_valid_nodes() <= est._min_samples_for_training
        ):
            est._resolve_pending_supervision()
        idx = est._sample_indices()
        ready = (
            idx is not None
            and est._mission_graph.get_num_valid_nodes() > est._min_samples_for_training
        )
        B = est._batch_size
        if not ready:
            edges = (
                (np.zeros((B, 2, self._E), np.int32), np.zeros((B, self._E), bool))
                if self._gcn else (None, None)
            )
            return (
                np.zeros((self._rows, self._D), np.float32),
                np.zeros((self._rows,), np.float32),
                np.zeros((self._rows,), bool),
                np.zeros((self._rows,), bool),
                *edges,
            )
        with est.lock:
            x, y, yv, sv = est._gather_batch(est._buffer, jnp.asarray(idx))
            if self._gcn:
                eb, evb = self._local_adjacency(est._buffer.seg[jnp.asarray(idx)])
        edges = (np.asarray(eb), np.asarray(evb)) if self._gcn else (None, None)
        return (
            np.asarray(x).reshape(-1, self._D),
            np.asarray(y).reshape(-1),
            np.asarray(yv).reshape(-1),
            np.asarray(sv).reshape(-1),
            *edges,
        )

    def step(self) -> dict:
        """One COLLECTIVE optimization step of the product train step
        over the global dp-sharded batch."""
        from ..utils.data import TravBatch

        x, y, yv, sv, eb, evb = self._local_rows()
        batch = TravBatch(
            x=_to_global(x, self._dp),
            y=_to_global(y, self._dp),
            y_valid=_to_global(yv, self._dp),
            sample_valid=_to_global(sv, self._dp),
        )
        if self._gcn:
            # per-node adjacency rides the same dp axis (node-major rows)
            batch = batch._replace(
                edges=_to_global(eb, self._dp), edge_valid=_to_global(evb, self._dp)
            )
        self._params, self._opt_state, self._cg_state, loss, aux = (
            self._est._train_step_on_batch(self._params, self._opt_state, self._cg_state, batch)
        )
        self._step += 1
        return {"loss_total": float(loss), "step": self._step,
                **{k: float(v) for k, v in aux.items()}}

    def sync_to_estimator(self) -> None:
        """Write the global params / optimizer / confidence state back
        into the local estimator (hot-swap + checkpoint surface).
        COLLECTIVE when tp > 1 (the tp-sharded kernels are re-gathered
        to replicated by a compiled identity — every process must
        call); local-only reads otherwise. Call at the checkpoint
        cadence."""
        import jax
        import jax.numpy as jnp

        params, opt_state = self._params, self._opt_state
        if self._tp > 1:
            # compiled all-gather: reshard every leaf to replicated so
            # addressable_data(0) holds the full value on every process
            # (the jitted step may have propagated the kernels' tp
            # sharding into the Adam moments too)
            tree = (params, opt_state)
            params, opt_state = jax.jit(lambda t: t, out_shardings=jax.tree_util.tree_map(
                lambda _: self._repl, tree))(tree)
        local = lambda t: jax.tree_util.tree_map(lambda l: jnp.asarray(_to_local(l)), t)
        self._est.adopt_train_state(
            local(params),
            local(opt_state),
            type(self._est.confidence_state)(
                *[jnp.asarray(_to_local(l)) for l in self._cg_state]
            ),
            step=self._step,
        )

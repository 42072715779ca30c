"""TraversabilityEstimator — the online self-supervised learning engine.

Re-design of the reference engine
(/root/reference/wild_visual_navigation/traversability_estimator/traversability_estimator.py:33-505)
around two jitted device programs plus host-side graph bookkeeping:

  * `_reproject_update` — the supervision hot path (reference
    add_supervision_node, :198-300): for a fixed fan-out of B_max
    in-range mission nodes, project the footprint polygon with each
    node's camera, rasterize the convex hull, fuse pessimistically
    (min with the +inf-sentinel mask ≡ the reference's fmin over NaN
    masks), and recompute per-segment supervision signals — one XLA
    program, no per-node host loop.
  * `_train_step` — sample-batch forward/loss/backward/Adam plus the
    confidence-generator state update, fused (reference train(),
    :448-497, ran four separate torch phases).

Host side: mission/supervision graphs gate node insertion by SE(3)
distance and answer radius queries (numpy); the device ring buffer
(mission_buffer.py) holds the padded training state.

Checkpointing keeps the reference's three surfaces (SURVEY.md §5):
hot-swap state (params + confidence stats), full mission checkpoints
(params + optimizer + confidence + step), and dataset export.
"""

from __future__ import annotations

import os
import pickle
import threading
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from ..models import apply_model, get_model, init_model, model_needs_edges
from ..ops.projection import Camera
from ..ops.rasterize import project_and_render
from ..ops.segment_ops import segment_masked_mean
from ..utils.confidence_generator import (
    ConfidenceConfig,
    confidence_init,
    confidence_load_state_dict,
    confidence_state_dict,
)
from ..utils.data import TravBatch
from ..utils.locks import TrackedRLock
from ..utils.loss import (
    AnomalyLossConfig,
    TraversabilityLossConfig,
    anomaly_loss,
    traversability_loss,
)
from ..utils.operation_modes import WVNMode
from .graphs import BaseGraph, DistanceWindowGraph, MaxElementsGraph
from .mission_buffer import MissionBuffer, buffer_init, buffer_insert
from .nodes import MissionNode, SupervisionNode

_MAX_FOOTPRINT_POINTS = 64  # static pad for footprint polygons


def _node_owns_slot(node) -> bool:
    """Mission nodes still holding a ring-buffer slot are spared from
    the graph's FIFO eviction (module-level so graphs stay picklable)."""
    return getattr(node, "buffer_slot", -1) >= 0


class TraversabilityEstimator:
    def __init__(
        self,
        model_cfg: dict,
        loss_cfg: Optional[TraversabilityLossConfig] = None,
        anomaly_loss_cfg: Optional[AnomalyLossConfig] = None,
        lr: float = 1e-3,
        max_distance: float = 3.0,
        image_distance_thr: float = 0.2,
        supervision_distance_thr: float = 0.1,
        min_samples_for_training: int = 5,
        batch_size: int = 8,
        mode: WVNMode = WVNMode.ONLINE,
        extraction_store_folder: Optional[str] = None,
        anomaly_detection: bool = False,
        # fixed-shape capacities
        buffer_capacity: int = 256,
        num_segments: int = 100,
        feature_dim: int = 384,
        image_height: int = 224,
        image_width: int = 224,
        max_edges: int = 1024,
        reprojection_fanout: int = 32,
        seed: int = 42,
        vis_node_index: int = 10,
        log_confidence_folder: Optional[str] = None,
        log_every: int = 20,
        supervision_flush_every: int = 1,
        supervision_resolve_every: int = 1,
        graph_max_elements_factor: int = 4,
        mesh=None,
    ):
        """graph_max_elements_factor: the ONLINE mission graph keeps at
        most `factor * buffer_capacity` host nodes (the reference keeps
        its graph unbounded — a documented divergence, see PARITY.md;
        slot-holding nodes are never evicted regardless).

        mesh: optional jax.sharding.Mesh with ("dp", "tp") axes. When
        given, the train step shards the sample batch and the
        supervision reprojection shards its fan-out axis over "dp"
        (parallel/mesh.py) — XLA inserts the gradient psum / gathers.
        Numerics are unchanged (equivalence-tested on the CPU mesh)."""
        self._mode = mode
        self._mesh = mesh
        self._extraction_store_folder = extraction_store_folder
        self._min_samples_for_training = min_samples_for_training
        self._batch_size = batch_size
        self._anomaly_detection = anomaly_detection
        self._H, self._W = image_height, image_width
        self._S, self._D = num_segments, feature_dim
        self._max_edges = max_edges  # per-node adjacency capacity (GCN heads)
        self._B_max = reprojection_fanout
        self._vis_node_index = vis_node_index
        self._vis_mission_node = None

        # Graphs (reference traversability_estimator.py:55-62)
        self._supervision_graph = DistanceWindowGraph(
            max_distance=max_distance, edge_distance=supervision_distance_thr
        )
        if mode == WVNMode.EXTRACT_LABELS:
            self._mission_graph: BaseGraph = MaxElementsGraph(
                edge_distance=image_distance_thr, max_elements=buffer_capacity
            )
        else:
            # The reference's ONLINE mission graph is unbounded
            # (BaseGraph) — over a long mission the host node list grows
            # without limit while only `buffer_capacity` nodes can hold
            # training data. Cap at graph_max_elements_factor x capacity
            # (documented divergence, PARITY.md), but never FIFO-evict a
            # node that still owns a ring-buffer slot (with mixed
            # training/non-training cameras, slot holders can be an
            # arbitrarily small fraction of graph insertions): slot
            # holders are bounded by the buffer capacity, so the graph
            # stays <= (factor+1) x capacity total.
            self._mission_graph = MaxElementsGraph(
                edge_distance=image_distance_thr,
                max_elements=graph_max_elements_factor * buffer_capacity,
                keep_fn=_node_owns_slot,  # module-level: the graph is pickled
            )

        # Device state
        self._buffer = buffer_init(buffer_capacity, num_segments, feature_dim, image_height, image_width)
        self._next_slot = 0
        self._slot_to_node: dict[int, MissionNode] = {}

        # Model + optimizer + loss (reference :80-100)
        self._model = get_model(model_cfg)
        rng = jax.random.PRNGKey(seed)
        self._params = init_model(self._model, rng, feature_dim)
        if anomaly_detection:
            self._loss_cfg = anomaly_loss_cfg or AnomalyLossConfig()
        else:
            self._loss_cfg = loss_cfg or TraversabilityLossConfig()
        self._cg_cfg: ConfidenceConfig = self._loss_cfg.confidence
        self._lr = lr
        self._tx = optax.adam(lr)
        self._opt_state = self._tx.init(self._params)
        self._cg_state = confidence_init()
        self._step = 0
        self._loss = float("inf")

        # ONE re-entrant lock serializes every mission-buffer read and
        # mutation (insert/flush/train all DONATE the buffer pytree, so
        # a concurrent reader of a stale reference would touch deleted
        # device arrays). Callbacks and the learning thread both take
        # it; the runtime holds it across its fused
        # allocate->insert->commit sequence via the `lock` property.
        self._lock = TrackedRLock()
        self._pause_training = False
        self._pause_mission_graph = False
        self._pause_supervision_graph = False
        # (mission_nodes, device counts) awaiting flag resolution
        self._pending_supervision: list = []
        # confidence-sample journal (reference confidence_generator.py:165-178)
        self._log_confidence_folder = log_confidence_folder
        self._log_every = log_every
        # micro-batched supervision: queue up to `supervision_flush_every`
        # footprint updates and apply them in ONE device program (the
        # in-program scan preserves sequential min-fusion semantics
        # exactly while cutting dispatch count)
        self._flush_every = max(1, supervision_flush_every)
        self._pending_footprints: list = []
        # resolve supervision-count flags (a BLOCKING D2H readback that
        # fences the whole device queue — frames program included) only
        # every N train calls; in between, sampling uses slightly stale
        # validity flags, which is semantically fine for an online
        # system (the reference's validity propagates asynchronously
        # through its learning thread too). Bootstraps unconditionally
        # while too few nodes are known-valid.
        self._resolve_every = max(1, supervision_resolve_every)
        self._train_calls = 0

        self._build_jitted()

    def flush_supervision(self):
        """Apply all queued footprint updates in one device program.

        The queue length is PADDED to the static `supervision_flush_every`
        (pad entries use all-OOB slot indices, which scatter-drop — a
        padded update is a no-op): a forced early flush (slot recycling,
        resolve, export) would otherwise trace a new scan length Q and
        recompile mid-mission — the soak harness (tools/soak.py) caught
        exactly that, two recompiles firing only once the ring buffer
        first wrapped."""
        with self._lock:
            if not self._pending_footprints:
                return
            pending, self._pending_footprints = self._pending_footprints, []
            Q = self._flush_every
            drop_idx = np.full((self._B_max,), self._buffer.capacity, np.int32)
            zero_fp = np.zeros((_MAX_FOOTPRINT_POINTS, 3), np.float32)
            for start in range(0, len(pending), Q):
                chunk = pending[start : start + Q]
                pad = Q - len(chunk)
                idxs = np.stack([p[0] for p in chunk] + [drop_idx] * pad)
                fps = np.stack([p[1] for p in chunk] + [zero_fp] * pad)
                travs = np.asarray([p[2] for p in chunk] + [0.0] * pad, np.float32)
                self._buffer, counts = self._reproject_update(
                    self._buffer, jnp.asarray(idxs), jnp.asarray(fps), jnp.asarray(travs)
                )
                for (_, _, _, nodes), c in zip(chunk, counts):
                    self._pending_supervision.append((nodes, c))
        # Bound the queue: while learning is paused (the only path that
        # resolves on cadence stops running) supervision keeps arriving
        # at 10-20 Hz — an unbounded list leaks device count arrays and
        # pins evicted nodes for hours. Resolve outside the lock once
        # the backlog is real.
        if len(self._pending_supervision) >= 64:
            self._resolve_pending_supervision()

    def _resolve_pending_supervision(self):
        """Batched readback of deferred supervision counts -> node
        validity flags (one D2H transfer for all pending updates)."""
        with self._lock:
            self.flush_supervision()
            if not self._pending_supervision:
                return
            pending, self._pending_supervision = self._pending_supervision, []
        # D2H readback OUTSIDE the lock: it drains the device queue, and
        # camera callbacks must not stall behind it.
        all_counts = np.asarray(jnp.stack([c for _, c in pending]))
        with self._lock:
            # flag writes back UNDER the lock, and only for nodes that
            # still own their slot — allocate_slot may have recycled a
            # node meanwhile (its supervision died with the slot).
            for (nodes, _), counts in zip(pending, all_counts):
                for i, n in enumerate(nodes):
                    if n.buffer_slot >= 0:
                        n._has_supervision = bool(counts[i] > 0)

    # ------------------------------------------------------------ jitted
    def _build_jitted(self):
        H, W, S = self._H, self._W, self._S
        model, tx = self._model, self._tx
        loss_cfg = self._loss_cfg
        anomaly = self._anomaly_detection
        mesh = self._mesh

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            def _shard_rows(x):
                """Constrain the leading axis over the mesh's dp axis
                (SURVEY §2.4 / §5: the reprojection fan-out and the
                training batch are the scaling axes — XLA splits the
                rasterization / forward+backward across chips and
                inserts the psum/all-gathers)."""
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, PartitionSpec("dp", *([None] * (x.ndim - 1))))
                )
        else:
            def _shard_rows(x):
                return x

        @partial(jax.jit, donate_argnums=(0,))
        def _reproject_update(buf: MissionBuffer, idxs, footprints, travs):
            """Apply Q sequential footprint updates in one program.

            idxs: (Q, B_max) int32 slots (== capacity pads, which
            scatter-drop); footprints: (Q, P, 3); travs: (Q,). A
            lax.scan over Q reproduces the exact sequential fmin
            semantics of Q separate updates. Under a mesh, the B_max
            fan-out axis (project + rasterize + fuse + segment means
            per in-range view) is dp-sharded."""

            def one(buf, args):
                idx, footprint, trav = args
                sel = idx.clip(0, buf.capacity - 1)
                K_sel = _shard_rows(buf.K[sel])
                pose_sel = _shard_rows(buf.pose_cam_in_world[sel])
                masks_sel = _shard_rows(buf.supervision_mask[sel])
                seg_sel = _shard_rows(buf.seg[sel])
                B = idx.shape[0]
                cam = Camera(K=K_sel, height=H, width=W)
                pts = jnp.broadcast_to(footprint[None], (B, footprint.shape[0], 3))
                inside, _, _ = project_and_render(cam, pose_sel, pts)
                vals = jnp.where(inside, trav, jnp.inf)
                fused = jnp.minimum(masks_sel, vals)
                sig, sv = jax.vmap(lambda m, s: segment_masked_mean(m, jnp.isfinite(m), s, S))(fused, seg_sel)
                new = buf._replace(
                    supervision_mask=buf.supervision_mask.at[idx].set(fused, mode="drop"),
                    signal=buf.signal.at[idx].set(sig, mode="drop"),
                    signal_valid=buf.signal_valid.at[idx].set(sv, mode="drop"),
                )
                return new, jnp.sum(sv, axis=-1)

            return jax.lax.scan(one, buf, (idxs, footprints, travs))

        def _model_res(params, batch):
            """Rows for row heads; per-node graph application for GCNs
            (the reference's pyg Batch keeps per-node edge_index,
            nodes.py:199-214 + make_batch)."""
            if batch.edges is not None:
                B = batch.edges.shape[0]
                xn = batch.x.reshape(B, -1, batch.x.shape[-1])
                res = jax.vmap(
                    lambda xi, e, ev: model.apply(params, xi, e, ev)
                )(xn, batch.edges, batch.edge_valid)
                return res.reshape(-1, res.shape[-1])
            return apply_model(model, params, batch.x)

        def _loss_on_batch(params, batch, cg_state):
            res = _model_res(params, batch)
            if anomaly:
                # Flow over positively-labeled samples only (reference
                # as_pyg_data(anomaly_detection=True), nodes.py:208-214).
                return anomaly_loss(loss_cfg, res, batch.y_valid & batch.sample_valid, cg_state)
            return traversability_loss(loss_cfg, batch, res, cg_state)

        def _step_on_batch(params, opt_state, cg_state, batch: TravBatch):
            """The product optimization step on an assembled TravBatch:
            confidence-weighted loss -> grads -> Adam -> confidence
            state update. Shared by the fused single-dispatch step
            below and the multi-process trainer
            (parallel/distributed.py), so both run identical math."""

            def lf(p):
                loss, aux, cg2 = _loss_on_batch(p, batch, cg_state)
                return loss, (aux, cg2)

            (loss, (aux, cg2)), grads = jax.value_and_grad(lf, has_aux=True)(params)
            updates, opt2 = tx.update(grads, opt_state)
            params2 = optax.apply_updates(params, updates)
            small_aux = {k: v for k, v in aux.items() if k != "confidence"}
            return params2, opt2, cg2, loss, small_aux

        # NOTE: params are NOT donated — the runtime's inference mailbox
        # aliases the latest params pytree (zero-copy hot-swap), so the
        # train step must not invalidate the previous buffers. They are
        # tiny (an MLP head); only the optimizer state is donated.
        # The batch gather happens INSIDE the step (buf + idx in), so
        # one training iteration is a single device dispatch. Under a
        # mesh, the gathered sample rows are dp-sharded, so the
        # forward/backward splits across chips and XLA psums the grads.
        is_gcn = model_needs_edges(model)

        @partial(jax.jit, donate_argnums=(1,))
        def _train_step(params, opt_state, cg_state, buf: MissionBuffer, idx):
            x = _shard_rows(buf.features[idx])
            y = _shard_rows(buf.signal[idx])
            yv = _shard_rows(buf.signal_valid[idx])
            sv = _shard_rows(buf.feat_valid[idx] & buf.valid[idx][:, None])
            batch = TravBatch(
                x=x.reshape(-1, x.shape[-1]), y=y.reshape(-1), y_valid=yv.reshape(-1), sample_valid=sv.reshape(-1)
            )
            if is_gcn:
                # per-node segment adjacency recomputed from the stored
                # segmentation (the reference's pyg edge_index travels
                # with each node; here `seg` is the source of truth)
                from ..ops.segment_ops import adjacency_list

                eb, evb = jax.vmap(
                    lambda s: adjacency_list(s, S, max_edges=self._max_edges)
                )(_shard_rows(buf.seg[idx]))
                batch = batch._replace(edges=eb, edge_valid=evb)
            return _step_on_batch(params, opt_state, cg_state, batch)

        @jax.jit
        def _gather_batch(buf: MissionBuffer, idx):
            x = buf.features[idx]
            y = buf.signal[idx]
            yv = buf.signal_valid[idx]
            sv = buf.feat_valid[idx] & buf.valid[idx][:, None]
            return x, y, yv, sv

        self._reproject_update = _reproject_update
        self._train_step_fn = _train_step
        self._train_step_on_batch = jax.jit(_step_on_batch)
        self._gather_batch = _gather_batch

    # --------------------------------------------------------- properties
    @property
    def loss(self) -> float:
        return self._loss

    @property
    def step(self) -> int:
        return self._step

    @property
    def params(self):
        return self._params

    @property
    def confidence_state(self):
        return self._cg_state

    @property
    def model(self):
        return self._model

    @property
    def buffer(self) -> MissionBuffer:
        return self._buffer

    @property
    def pause_learning(self) -> bool:
        return self._pause_training

    @pause_learning.setter
    def pause_learning(self, pause: bool):
        self._pause_training = pause

    @property
    def pause_mission_graph(self) -> bool:
        return self._pause_mission_graph

    @pause_mission_graph.setter
    def pause_mission_graph(self, pause: bool):
        self._pause_mission_graph = pause

    @property
    def pause_supervision_graph(self) -> bool:
        return self._pause_supervision_graph

    @pause_supervision_graph.setter
    def pause_supervision_graph(self, pause: bool):
        self._pause_supervision_graph = pause

    def get_num_valid_nodes(self) -> int:
        self._resolve_pending_supervision()
        return self._mission_graph.get_num_valid_nodes()

    def get_mission_nodes(self):
        return self._mission_graph.get_nodes()

    def get_supervision_nodes(self):
        return self._supervision_graph.get_nodes()

    def get_last_valid_mission_node(self):
        self._resolve_pending_supervision()
        for node in reversed(self._mission_graph.get_nodes()):
            if node.is_valid():
                return node
        return None

    def update_visualization_node(self):
        """reference traversability_estimator.py:154-163."""
        nodes = self._mission_graph.get_nodes()
        if not nodes:
            return
        if len(nodes) <= self._vis_node_index:
            self._vis_mission_node = nodes[0]
        else:
            self._vis_mission_node = nodes[-self._vis_node_index]

    # ------------------------------------------------------- node intake
    def allocate_slot(self, node: MissionNode) -> Optional[int]:
        """Graph-gate the node and reserve a ring-buffer slot WITHOUT
        writing the buffer — the runtime's fused frame program writes
        the payload itself and commits via `commit_buffer` (one device
        dispatch for extract+infer+insert)."""
        if self._pause_mission_graph:
            return None
        success = self._mission_graph.add_node(node)
        if not (success and node.use_for_training):
            return None
        with self._lock:
            # pending footprint updates reference buffer slots by index;
            # apply them before a slot can be recycled
            if self._slot_to_node.get(self._next_slot % self._buffer.capacity) is not None:
                self.flush_supervision()
            slot = self._next_slot % self._buffer.capacity
            self._next_slot += 1
            node.buffer_slot = slot
            evicted = self._slot_to_node.pop(slot, None)
            if evicted is not None:
                evicted._has_supervision = False
                evicted.buffer_slot = -1
            self._slot_to_node[slot] = node
        return slot

    def commit_buffer(self, new_buffer: MissionBuffer):
        """Adopt a buffer updated by an external fused program. The
        caller must hold `self.lock` from before the program consumed
        (donated) the previous buffer — see WVNRuntime.image_callback."""
        with self._lock:
            self._buffer = new_buffer

    @property
    def lock(self) -> TrackedRLock:
        """The single lock serializing mission-buffer access. External
        fused programs that donate the buffer (runtime/_frame_and_insert)
        must hold it across read->dispatch->commit. TrackedRLock: the
        runtime's signal handler reads `held_by_current_thread` to
        decide whether to defer shutdown (fail-safe ownership, no
        CPython-private API)."""
        return self._lock

    def add_mission_node(
        self,
        node: MissionNode,
        features: jnp.ndarray,
        feat_valid: jnp.ndarray,
        seg: jnp.ndarray,
        K_scaled: jnp.ndarray,
        verbose: bool = False,
    ) -> bool:
        """Gate by travel distance, then write the training payload into
        the device ring buffer (reference add_mission_node, :165-196)."""
        with self._lock:
            slot = self.allocate_slot(node)
            if slot is None:
                return False
            self._buffer = buffer_insert(
                self._buffer,
                jnp.asarray(slot),
                jnp.asarray(features, jnp.float32),
                jnp.asarray(feat_valid, bool),
                jnp.asarray(seg),
                jnp.asarray(K_scaled, jnp.float32),
                jnp.asarray(node.pose_cam_in_world, jnp.float32),
            )
        if verbose:
            print(f"adding node [{node}], total nodes [{self._mission_graph.get_num_nodes()}]")
        return True

    def add_supervision_node(self, pnode: SupervisionNode) -> bool:
        """reference add_supervision_node (:198-300): gate, build the
        footprint against the previous node, batch-reproject into all
        in-range mission nodes, fuse, update signals."""
        if self._pause_supervision_graph or not pnode.is_valid():
            return False

        last_pnode = self._supervision_graph.get_last_node()
        success = self._supervision_graph.add_node(pnode)
        if not success:
            if last_pnode is not None:
                last_pnode.update_traversability(pnode.traversability, pnode.traversability_var)
            return False
        if last_pnode is None or not last_pnode.is_valid():
            return False

        footprint = pnode.make_footprint_with_node(last_pnode)
        # static pad to _MAX_FOOTPRINT_POINTS (duplicates don't change the hull)
        P = footprint.shape[0]
        if P > _MAX_FOOTPRINT_POINTS:
            sel = np.linspace(0, P - 1, _MAX_FOOTPRINT_POINTS).astype(int)
            footprint = footprint[sel]
        elif P < _MAX_FOOTPRINT_POINTS:
            footprint = np.concatenate(
                [footprint, np.tile(footprint[-1:], (_MAX_FOOTPRINT_POINTS - P, 1))], axis=0
            )

        last_mission_node = self._mission_graph.get_last_node()
        if last_mission_node is None:
            return False
        mission_nodes = self._mission_graph.get_nodes_within_radius_range(
            last_mission_node, 0.0, self._supervision_graph.max_distance
        )
        mission_nodes = [n for n in mission_nodes if n.buffer_slot >= 0]
        if not mission_nodes:
            return False
        mission_nodes = mission_nodes[-self._B_max :]

        idx = np.full((self._B_max,), self._buffer.capacity, dtype=np.int32)  # OOB = drop
        for i, n in enumerate(mission_nodes):
            idx[i] = n.buffer_slot

        # Queue the update; flush applies up to `_flush_every` of them
        # in one device program. Counts readback stays deferred too.
        with self._lock:
            self._pending_footprints.append((idx, footprint.astype(np.float32),
                                             float(pnode.traversability), mission_nodes))
            if len(self._pending_footprints) >= self._flush_every:
                self.flush_supervision()

            if self._mode == WVNMode.EXTRACT_LABELS and self._extraction_store_folder:
                self.flush_supervision()
                self._export_supervision_masks(mission_nodes)
        return True

    def _export_supervision_masks(self, mission_nodes):
        os.makedirs(os.path.join(self._extraction_store_folder, "supervision_mask"), exist_ok=True)
        masks = np.asarray(self._buffer.supervision_mask)
        for n in mission_nodes:
            # reference traversability_estimator.py:295-297 exports
            # torch.nan_to_num(mask.nanmean(0)) != 0: unset pixels
            # (NaN there, non-finite sentinel here) AND fused
            # zero-traversability pixels both store False
            m = masks[n.buffer_slot]
            store = np.isfinite(m) & (m != 0)
            path = os.path.join(
                self._extraction_store_folder, "supervision_mask", str(n.timestamp).replace(".", "_") + ".npy"
            )
            np.save(path, store)

    # ---------------------------------------------------------- training
    def _sample_indices(self, batch_size: Optional[int] = None):
        """Locked slot sampling WITHOUT resolving pending supervision —
        callers must have resolved already (resolve performs a blocking
        D2H readback that must not run while an outer RLock acquisition
        keeps the lock held for waiting camera callbacks)."""
        batch_size = batch_size or self._batch_size
        with self._lock:
            valid = [n for n in self._mission_graph.get_valid_nodes() if n.buffer_slot >= 0]
            if not valid:
                return None
            slots = np.array([n.buffer_slot for n in valid], dtype=np.int32)
        return np.random.choice(slots, size=batch_size, replace=len(slots) < batch_size)

    def sample_batch_indices(self, batch_size: Optional[int] = None):
        """Random valid buffer slots (host RNG); replacement only when
        fewer valid nodes than batch_size (fixed shapes)."""
        self._resolve_pending_supervision()
        return self._sample_indices(batch_size)

    def make_batch(self, batch_size: Optional[int] = None):
        """Sample random valid nodes and gather their training arrays
        (reference make_batch, :431-446)."""
        idx = self.sample_batch_indices(batch_size)
        if idx is None:
            return None
        with self._lock:
            return self._gather_batch(self._buffer, jnp.asarray(idx))

    def train(self, convert_losses: bool = True) -> dict:
        """One optimization step (reference train(), :448-497).

        convert_losses=False leaves the loss values as device scalars in
        the return dict (and self.loss stale) — the production runtime
        converts at its logging cadence instead of stalling every step
        on a device->host readback."""
        if self._pause_training:
            return {}
        self._train_calls += 1
        if (
            self._train_calls % self._resolve_every == 0
            or self._mission_graph.get_num_valid_nodes() <= self._min_samples_for_training
        ):
            self._resolve_pending_supervision()
        num_valid = self._mission_graph.get_num_valid_nodes()
        return_dict = {"mission_graph_num_valid_node": num_valid}
        if num_valid > self._min_samples_for_training:
            with self._lock:
                # _sample_indices, not sample_batch_indices: pending
                # supervision was resolved above, and resolving again
                # here would run its D2H readback with the RLock held
                idx = self._sample_indices(self._batch_size)
                if idx is None:
                    return_dict["loss_total"] = -1
                    return return_dict
                self._params, self._opt_state, self._cg_state, loss, aux = self._train_step_fn(
                    self._params, self._opt_state, self._cg_state, self._buffer, jnp.asarray(idx)
                )
            self._step += 1
            if self._log_confidence_folder and self._step % self._log_every == 0:
                os.makedirs(self._log_confidence_folder, exist_ok=True)
                np.savez(
                    os.path.join(self._log_confidence_folder, f"samples_{self._step:06d}.npz"),
                    mean=np.asarray(self._cg_state.mean),
                    std=np.asarray(self._cg_state.std),
                    var=np.asarray(self._cg_state.var),
                    loss=np.asarray(loss),
                )
            if convert_losses:
                self._loss = float(loss)
                return_dict["loss_total"] = self._loss
                return_dict["loss_trav"] = float(aux["loss_trav"])
                return_dict["loss_reco"] = float(aux["loss_reco"])
            else:
                return_dict["loss_total"] = loss
                return_dict["loss_trav"] = aux["loss_trav"]
                return_dict["loss_reco"] = aux["loss_reco"]
            return return_dict
        return_dict["loss_total"] = -1
        return return_dict

    def adopt_train_state(self, params, opt_state, cg_state, step: Optional[int] = None):
        """Replace the optimization state wholesale — used by the
        multi-process trainer (parallel/distributed.py), which steps
        the global replicated copies and periodically writes the
        process-local view back for inference/checkpointing."""
        with self._lock:
            self._params = params
            self._opt_state = opt_state
            self._cg_state = cg_state
            if step is not None:
                self._step = step

    # ------------------------------------------------------- checkpoints
    def state_dict_for_hot_swap(self) -> dict:
        """The params + confidence payload the inference process polls
        (reference .tmp_state_dict.pt, wvn_learning_node.py:382-394)."""
        return {
            "params": self._params,
            "confidence_generator": confidence_state_dict(self._cg_state),
            "step": self._step,
        }

    def save_checkpoint(self, mission_path: str, checkpoint_name: str = "last_checkpoint.ckpt") -> str:
        """Full mission checkpoint (reference :377-404): model,
        optimizer, confidence state, step, loss."""
        os.makedirs(mission_path, exist_ok=True)
        path = os.path.join(mission_path, checkpoint_name)
        payload = {
            "params": serialization.to_bytes(self._params),
            "opt_state": serialization.to_bytes(self._opt_state),
            "cg_state": serialization.to_bytes(self._cg_state),
            "step": self._step,
            "loss": self._loss,
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        return path

    def load_checkpoint(self, checkpoint_path: str):
        """reference :406-429."""
        with open(checkpoint_path, "rb") as f:
            payload = pickle.load(f)
        self._params = serialization.from_bytes(self._params, payload["params"])
        self._opt_state = serialization.from_bytes(self._opt_state, payload["opt_state"])
        self._cg_state = serialization.from_bytes(self._cg_state, payload["cg_state"])
        self._step = payload["step"]
        self._loss = payload["loss"]
        self._pause_training = False
        print(f"Loaded checkpoint from file {checkpoint_path}")

    def save_checkpoint_orbax(self, mission_path: str, step: Optional[int] = None) -> str:
        """Orbax-backed checkpoint (the idiomatic TPU checkpointing
        stack; async-capable, sharded-array aware). Same payload as
        save_checkpoint."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(mission_path, f"orbax_{step if step is not None else self._step}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {
            "params": self._params,
            "opt_state": self._opt_state,
            "cg_state": list(self._cg_state),
            "step": self._step,
        }, force=True)
        ckptr.wait_until_finished()
        return path

    def load_checkpoint_orbax(self, path: str):
        import orbax.checkpoint as ocp

        from ..utils.confidence_generator import ConfidenceState

        ckptr = ocp.StandardCheckpointer()
        template = {
            "params": self._params,
            "opt_state": self._opt_state,
            "cg_state": list(self._cg_state),
            "step": self._step,
        }
        restored = ckptr.restore(os.path.abspath(path), template)
        self._params = restored["params"]
        self._opt_state = restored["opt_state"]
        self._cg_state = ConfidenceState(*restored["cg_state"])
        self._step = int(restored["step"])

    def load_confidence_state_dict(self, d: dict):
        self._cg_state = confidence_load_state_dict(self._cg_state, d)

    def save_graph(self, mission_path: str):
        """Mission-graph dataset export for offline training (reference
        :347-375): per-node features / signals / masks as npz."""
        # resolve queued supervision first (like __getstate__): nodes
        # supervised after the last amortized resolve are otherwise
        # still flagged invalid and silently missing from the export
        self._resolve_pending_supervision()
        with self._lock:
            buf = self._buffer
            feats, sig, sv = np.asarray(buf.features), np.asarray(buf.signal), np.asarray(buf.signal_valid)
            fv = np.asarray(buf.feat_valid)
            seg = np.asarray(buf.seg)
        os.makedirs(mission_path, exist_ok=True)
        for node in self._mission_graph.get_valid_nodes():
            s = node.buffer_slot
            if s < 0:
                continue
            p = os.path.join(mission_path, f"graph_{str(node.timestamp).replace('.', '_')}.npz")
            np.savez_compressed(
                p, features=feats[s], signal=sig[s], signal_valid=sv[s], segments=seg[s],
                feat_valid=fv[s],
            )

    def reset(self):
        with self._lock:
            self._mission_graph.clear()
            self._supervision_graph.clear()
            self._pending_footprints = []
            self._pending_supervision = []
            self._buffer = buffer_init(self._buffer.capacity, self._S, self._D, self._H, self._W)
            self._slot_to_node = {}
            self._next_slot = 0
            self._cg_state = confidence_init()
            self._step = 0
            # a fresh mission must not inherit the previous one's Adam
            # moments, loss readout, resolve cadence, or a vis node
            # whose buffer slot was just wiped
            self._opt_state = self._tx.init(self._params)
            self._loss = float("inf")
            self._train_calls = 0
            self._vis_mission_node = None

    # ------------------------------------------------- whole-object pickle
    # (reference traversability_estimator.py:318-345 pickles the entire
    # estimator; jitted closures and locks are rebuilt on load, device
    # arrays round-trip through numpy.)
    def __getstate__(self):
        self._resolve_pending_supervision()
        # (resolve flushes pending footprints first)
        with self._lock:
            state = self.__dict__.copy()
            state["_pending_supervision"] = []
            state["_pending_footprints"] = []
            # locks, jitted closures, and the optax transformation (local
            # closures) are rebuilt in __setstate__; the mesh holds
            # process-local Device handles and is dropped (a loaded
            # estimator runs un-meshed until given a new one).
            for k in ("_lock", "_reproject_update", "_train_step_fn",
                      "_train_step_on_batch", "_gather_batch", "_tx"):
                state.pop(k, None)
            state["_mesh"] = None
            state["_buffer"] = jax.tree_util.tree_map(np.asarray, self._buffer)
            state["_params"] = jax.tree_util.tree_map(np.asarray, self._params)
            state["_opt_state"] = jax.tree_util.tree_map(np.asarray, self._opt_state)
            state["_cg_state"] = jax.tree_util.tree_map(np.asarray, self._cg_state)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._buffer = jax.tree_util.tree_map(jnp.asarray, self._buffer)
        self._params = jax.tree_util.tree_map(jnp.asarray, self._params)
        self._opt_state = jax.tree_util.tree_map(jnp.asarray, self._opt_state)
        self._cg_state = jax.tree_util.tree_map(jnp.asarray, self._cg_state)
        self._lock = TrackedRLock()
        self._tx = optax.adam(self._lr)
        self._build_jitted()

    def save_pickle(self, path: str) -> str:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(self, f)
        return path

    @staticmethod
    def load_pickle(path: str) -> "TraversabilityEstimator":
        with open(path, "rb") as f:
            return pickle.load(f)

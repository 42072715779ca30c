"""Fixed-shape training-batch containers.

Replaces the reference's torch_geometric-free `Data`/`Batch`
(/root/reference/wild_visual_navigation/utils/data.py:11-58). The
reference concatenates variable-length per-node tensors; here every
mission node carries a static number of segment slots `S` with a
validity mask, so a batch is a plain stack — fully jittable, no
ragged shapes, vmap-able.

`TravBatch` is the flattened view consumed by the loss/train step:
(B*S, ...) arrays where `sample_valid` marks real (non-padding,
non-empty) segments and `y_valid` marks supervised ones.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax.numpy as jnp


class NodeData(NamedTuple):
    """Per-mission-node training payload (the as_pyg_data analogue,
    reference nodes.py:199-241), padded to S segment slots."""

    x: jnp.ndarray  # (S, D) per-segment features
    y: jnp.ndarray  # (S,) supervision signal in [0, 1]
    y_valid: jnp.ndarray  # (S,) bool — segment has supervision
    sample_valid: jnp.ndarray  # (S,) bool — segment slot is real
    edges: Optional[jnp.ndarray] = None  # (2, E) int32
    edge_valid: Optional[jnp.ndarray] = None  # (E,) bool


class TravBatch(NamedTuple):
    """Flattened batch of node data: (N = B*S) samples.

    Graph heads (SimpleGCN) additionally carry per-node adjacency —
    the reference's pyg Batch.edge_index (nodes.py:199-214): `edges`
    (B, 2, E) + `edge_valid` (B, E); x reshapes back to (B, S, D) for
    the per-node model application. None for row heads."""

    x: jnp.ndarray  # (N, D)
    y: jnp.ndarray  # (N,)
    y_valid: jnp.ndarray  # (N,) bool
    sample_valid: jnp.ndarray  # (N,) bool
    edges: Optional[jnp.ndarray] = None  # (B, 2, E) int32
    edge_valid: Optional[jnp.ndarray] = None  # (B, E) bool

    @property
    def num_samples(self) -> jnp.ndarray:
        return jnp.sum(self.sample_valid)


def batch_from_nodes(nodes: Sequence[NodeData]) -> TravBatch:
    """Stack + flatten node payloads (Batch.from_data_list analogue,
    reference data.py:21-58 — no ptr/offset bookkeeping is needed
    because slots are fixed-size)."""
    x = jnp.concatenate([n.x for n in nodes], axis=0)
    y = jnp.concatenate([n.y for n in nodes], axis=0)
    y_valid = jnp.concatenate([n.y_valid for n in nodes], axis=0)
    sample_valid = jnp.concatenate([n.sample_valid for n in nodes], axis=0)
    return TravBatch(x=x, y=y, y_valid=y_valid, sample_valid=sample_valid)


def batch_from_arrays(
    x: jnp.ndarray, y: jnp.ndarray, y_valid: jnp.ndarray, sample_valid: jnp.ndarray
) -> TravBatch:
    """Flatten (B, S, ...) stacked arrays into a TravBatch — the fast
    path used by the ring-buffer replay store (gather then reshape)."""
    D = x.shape[-1]
    return TravBatch(
        x=x.reshape(-1, D),
        y=y.reshape(-1),
        y_valid=y_valid.reshape(-1),
        sample_valid=sample_valid.reshape(-1),
    )

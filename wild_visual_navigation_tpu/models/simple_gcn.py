"""Graph-convolution traversability head over segment adjacency.

The reference's SimpleGCN
(/root/reference/wild_visual_navigation/model/simple_gcn.py:13-39) is
present but inert (its torch_geometric GCNConv import is commented
out). Here we implement the GCN properly, TPU-style: fixed-size padded
edge lists with validity masks, symmetric-normalized mean aggregation
realized as segment-sum scatter (XLA lowers this to efficient
on-device scatter-adds), no dynamic shapes.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def gcn_aggregate(x: jnp.ndarray, edges: jnp.ndarray, edge_valid: jnp.ndarray) -> jnp.ndarray:
    """Symmetric-normalized neighborhood aggregation (GCNConv rule).

    x: (S, D) node features; edges: (2, E) int32 (undirected, one
    direction per pair — both directions are added here); edge_valid:
    (E,) bool. Self-loops are always included.
    """
    S = x.shape[0]
    src = jnp.where(edge_valid, edges[0], 0)
    dst = jnp.where(edge_valid, edges[1], 0)
    w = edge_valid.astype(x.dtype)

    deg = jnp.ones((S,), dtype=x.dtype)  # self loops
    deg = deg.at[dst].add(w)
    deg = deg.at[src].add(w)
    norm = jax.lax.rsqrt(deg)

    msg_fwd = x[src] * (norm[src] * norm[dst] * w)[:, None]
    msg_bwd = x[dst] * (norm[src] * norm[dst] * w)[:, None]
    out = x * (norm * norm)[:, None]  # self loop
    out = out.at[dst].add(msg_fwd)
    out = out.at[src].add(msg_bwd)
    return out


class SimpleGCN(nn.Module):
    """GCN stack mirroring the reference's intended topology
    (simple_gcn.py:13-39): GCNConv(input, hidden) -> ReLU ->
    GCNConv(hidden, hidden) -> per-node Linear head, with the same
    [sigmoid(trav) || reconstruction] output convention as SimpleMLP."""

    input_size: int = 384
    hidden_sizes: Sequence[int] = (256, 128, 1)
    reconstruction: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def nr_sigmoid_layers(self) -> int:
        return self.hidden_sizes[-1]

    @nn.compact
    def __call__(self, x: jnp.ndarray, edges: jnp.ndarray, edge_valid: jnp.ndarray) -> jnp.ndarray:
        h = x.astype(self.dtype)
        for hs in self.hidden_sizes[:-1]:
            h = nn.Dense(hs, dtype=self.dtype)(h)
            h = gcn_aggregate(h, edges, edge_valid)
            h = nn.relu(h)
        last = self.hidden_sizes[-1] + (self.input_size if self.reconstruction else 0)
        h = nn.Dense(last, dtype=self.dtype)(h).astype(jnp.float32)
        k = self.nr_sigmoid_layers
        return jnp.concatenate([nn.sigmoid(h[..., :k]), h[..., k:]], axis=-1)

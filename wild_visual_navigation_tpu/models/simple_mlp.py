"""Traversability MLP heads (flax.linen).

Re-design of the reference's production model
(/root/reference/wild_visual_navigation/model/simple_mlp.py:10-67):
a small Linear+ReLU stack whose last layer emits
[traversability (nr_sigmoid outputs, sigmoid-squashed) || feature
reconstruction (input_size outputs)] when `reconstruction=True`.

The forward takes a plain (N, D) feature array (the reference wraps it
in a `Data`); N is the padded flattened batch. bfloat16 compute is
supported via the `dtype` argument — params stay fp32, activations are
cast, the output is fp32 (the confidence statistics are precision
sensitive).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class SimpleMLP(nn.Module):
    """reference simple_mlp.py:10-39."""

    input_size: int = 64
    hidden_sizes: Sequence[int] = (255,)
    reconstruction: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def nr_sigmoid_layers(self) -> int:
        return self.hidden_sizes[-1]

    @property
    def output_features(self) -> int:
        return self.hidden_sizes[-1] + (self.input_size if self.reconstruction else 0)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x.astype(self.dtype)
        for hs in self.hidden_sizes[:-1]:
            h = nn.Dense(hs, dtype=self.dtype)(h)
            h = nn.relu(h)
        last = self.hidden_sizes[-1] + (self.input_size if self.reconstruction else 0)
        h = nn.Dense(last, dtype=self.dtype)(h).astype(jnp.float32)
        k = self.nr_sigmoid_layers
        return jnp.concatenate([nn.sigmoid(h[..., :k]), h[..., k:]], axis=-1)


class DoubleMLP(nn.Module):
    """Separate traversability and reconstruction towers
    (reference simple_mlp.py:42-67)."""

    input_size: int = 64
    hidden_sizes: Sequence[int] = (255,)
    dtype: jnp.dtype = jnp.float32

    @property
    def nr_sigmoid_layers(self) -> int:
        return self.hidden_sizes[-1]

    @property
    def output_features(self) -> int:
        return self.hidden_sizes[-1] + self.input_size

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def tower(h, last, name):
            for i, hs in enumerate(self.hidden_sizes[:-1]):
                h = nn.Dense(hs, dtype=self.dtype, name=f"{name}_{i}")(h)
                h = nn.relu(h)
            return nn.Dense(last, dtype=self.dtype, name=f"{name}_out")(h)

        h = x.astype(self.dtype)
        trav = nn.sigmoid(tower(h, self.hidden_sizes[-1], "trav").astype(jnp.float32))
        reco = tower(h, self.input_size, "reco").astype(jnp.float32)
        return jnp.concatenate([trav, reco], axis=-1)

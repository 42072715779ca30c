"""RealNVP normalizing flow for anomaly-detection mode (flax.linen).

Re-design of the reference's LinearRnvp
(/root/reference/wild_visual_navigation/model/linear_rnvp.py:216-296):
affine coupling layers alternating with fixed random permutations (or
mask flips), optional invertible batch norm, standard-normal prior.
Forward returns {z, log_det, logprob} exactly like the reference
(:279-283); `sample` inverts the flow.

The permutations are derived from a seed at module init (static), so
the whole flow is a pure function of (params, x) — no buffers.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class _CouplingNet(nn.Module):
    """The s/t conditioner: Linear(in, top[0]) + ReLU, then
    Linear(top[i-1], top[i]) + ReLU per entry, then Linear(top[-1], out)
    (reference linear_rnvp.py:96-111 — note the reference's loop makes
    the first topology entry appear twice; we reproduce that)."""

    topology: Sequence[int]
    out_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.topology[0], dtype=self.dtype)(x))
        for i in range(len(self.topology)):
            h = nn.relu(nn.Dense(self.topology[i], dtype=self.dtype)(h))
        return nn.Dense(self.out_size, dtype=self.dtype)(h)


class _CouplingLayer(nn.Module):
    """Affine coupling (reference linear_rnvp.py:67-152).

    forward:  x = m*u + (1-m) * (u * exp(s(m*u)) + t(m*u)),
    backward: u = m*x + (1-m) * (x - t(m*x)) * exp(-s(m*x)),
    with s squashed by tanh. single_function=True emits s,t from one
    net split in half; the default config uses two nets.
    """

    mask: Tuple[float, ...]
    topology: Sequence[int]
    single_function: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = len(self.mask)
        if self.single_function:
            self.s_net = _CouplingNet(self.topology, 2 * d, self.dtype)
        else:
            self.s_net = _CouplingNet(self.topology, d, self.dtype)
            self.t_net = _CouplingNet(self.topology, d, self.dtype)

    def _st(self, mx):
        if self.single_function:
            s, t = jnp.split(self.s_net(mx), 2, axis=-1)
        else:
            s, t = self.s_net(mx), self.t_net(mx)
        return jnp.tanh(s), t

    def __call__(self, u):
        m = jnp.asarray(self.mask, dtype=u.dtype)
        mu = u * m
        s, t = self._st(mu)
        x = mu + (1 - m) * (u * jnp.exp(s) + t)
        log_det = jnp.sum((1 - m) * s, axis=-1)
        return x, log_det

    def backward(self, x):
        m = jnp.asarray(self.mask, dtype=x.dtype)
        mx = x * m
        s, t = self._st(mx)
        u = mx + (1 - m) * (x - t) * jnp.exp(-s)
        log_det = jnp.sum(-(1 - m) * s, axis=-1)
        return u, log_det


class LinearRnvp(nn.Module):
    """reference linear_rnvp.py:216-296. Default config matches
    cfg/experiment_params.py:131-139 (input 384, topology [200],
    odds mask, permutations on, two conditioner nets)."""

    input_size: int = 384
    coupling_topology: Sequence[int] = (200,)
    flow_n: int = 2
    use_permutation: bool = True
    batch_norm: bool = False
    mask_type: str = "odds"
    single_function: bool = False
    permutation_seed: int = 0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.input_size
        if self.mask_type == "odds":
            mask = (np.arange(d) % 2).astype(np.float32)
        elif self.mask_type == "half":
            mask = np.zeros(d, np.float32)
            mask[: d // 2] = 1
        else:
            raise ValueError(self.mask_type)

        rng = np.random.RandomState(self.permutation_seed)
        layers = []
        perms = []
        m = mask
        for i in range(self.flow_n):
            layers.append(
                _CouplingLayer(
                    mask=tuple(m.tolist()),
                    topology=self.coupling_topology,
                    single_function=self.single_function,
                    dtype=self.dtype,
                )
            )
            if self.use_permutation:
                perms.append(rng.permutation(d))
            else:
                perms.append(None)
                m = 1 - m
        self.layers = layers
        self._perms = perms

    def _flow_forward(self, x):
        log_det = jnp.zeros(x.shape[:-1], dtype=jnp.float32)
        for layer, perm in zip(self.layers, self._perms):
            x, ld = layer(x)
            log_det = log_det + ld
            if perm is not None:
                x = x[..., jnp.asarray(perm)]
        return x, log_det

    def _flow_backward(self, u):
        log_det = jnp.zeros(u.shape[:-1], dtype=jnp.float32)
        for layer, perm in zip(reversed(self.layers), reversed(self._perms)):
            if perm is not None:
                u = u[..., jnp.asarray(np.argsort(perm))]
            u, ld = layer.backward(u)
            log_det = log_det + ld
        return u, log_det

    def logprob(self, z):
        """Per-dimension standard-normal log density (reference :271)."""
        return -0.5 * (z**2) - 0.5 * jnp.log(2 * jnp.pi)

    def __call__(self, x):
        z, log_det = self._flow_forward(x)
        return {"z": z, "log_det": log_det, "logprob": self.logprob(z)}

    def sample(self, key, samples: int = 1, return_logdet: bool = False):
        u = jax.random.normal(key, (samples, self.input_size))
        z, d = self._flow_backward(u)
        if return_logdet:
            return z, jnp.sum(self.logprob(u), axis=-1) + d
        return z

"""Mean-field dense-CRF refinement (ConvCRF-style) in pure jnp.

Closes the reference StegoInterface's optional CRF post-processing
(/root/reference/wild_visual_navigation/feature_extractor/stego_interface.py:31-39
`run_crf`; the external stego package wraps pydensecrf). The classic
dense CRF's global bilateral filtering (permutohedral lattice) is
replaced by the ConvCRF formulation: pairwise message passing truncated
to a KxK window, computed as shifted-compare Gaussian kernels — fully
vectorized, fixed iterations, jittable, and at robot image sizes
captures the same local label smoothing the reference gets (long-range
links contribute negligibly at 224-448 px).

Energy: E(x) = sum_i unary_i(x_i) + sum_{i,j in window} mu(x_i, x_j)
  * [w_app * exp(-|p_i-p_j|^2/2th_a^2 - |I_i-I_j|^2/2th_b^2)
     + w_smooth * exp(-|p_i-p_j|^2/2th_g^2)]
with Potts compatibility mu = 1[x_i != x_j].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(
    jax.jit,
    static_argnames=("iterations", "window", "theta_alpha", "theta_beta", "theta_gamma", "w_appearance", "w_smoothness"),
)
def meanfield_crf(
    logits: jnp.ndarray,
    image: jnp.ndarray,
    iterations: int = 5,
    window: int = 7,
    theta_alpha: float = 8.0,
    theta_beta: float = 0.08,
    theta_gamma: float = 3.0,
    w_appearance: float = 3.0,
    w_smoothness: float = 1.0,
) -> jnp.ndarray:
    """Refine per-pixel class logits with the guiding image.

    logits: (C, H, W); image: (3, H, W) in [0, 1].
    Returns refined logits (C, H, W).
    """
    C, H, W = logits.shape
    half = window // 2
    offsets = [(dy, dx) for dy in range(-half, half + 1) for dx in range(-half, half + 1) if (dy, dx) != (0, 0)]

    # Precompute per-offset pairwise weights (shift-compare bilateral).
    weights = []
    for dy, dx in offsets:
        shifted = jnp.roll(image, shift=(-dy, -dx), axis=(1, 2))
        color2 = jnp.sum((image - shifted) ** 2, axis=0)  # (H, W)
        spatial2 = float(dy * dy + dx * dx)
        w_app = w_appearance * jnp.exp(-spatial2 / (2 * theta_alpha**2) - color2 / (2 * theta_beta**2))
        w_smooth = w_smoothness * jnp.exp(-spatial2 / (2 * theta_gamma**2))
        w = w_app + w_smooth
        # mask pixels whose neighbor wrapped around the border
        ys = jnp.arange(H)[:, None]
        xs = jnp.arange(W)[None, :]
        valid = ((ys + dy >= 0) & (ys + dy < H) & (xs + dx >= 0) & (xs + dx < W)).astype(w.dtype)
        weights.append(w * valid)
    weights = jnp.stack(weights)  # (K, H, W)

    def body(_, q):
        # message_i(c) = sum_offsets w(i, off) * q_{i+off}(c)
        # (static unroll — the offset count is small and static)
        acc = jnp.zeros_like(q)
        for i, (dy, dx) in enumerate(offsets):
            shifted_q = jnp.roll(q, shift=(-dy, -dx), axis=(1, 2))
            acc = acc + weights[i][None] * shifted_q
        # Potts compatibility: penalize mass on other labels ->
        # logits update = unary - (total message - own-label message)
        refined = logits - (jnp.sum(acc, axis=0, keepdims=True) - acc)
        return jax.nn.softmax(refined, axis=0)

    q = jax.nn.softmax(logits, axis=0)
    q = jax.lax.fori_loop(0, iterations, body, q)
    return jnp.log(jnp.clip(q, 1e-8, 1.0))


def crf_refine_labels(labels: jnp.ndarray, image: jnp.ndarray, num_classes: int, confidence: float = 4.0, **kw) -> jnp.ndarray:
    """Refine hard labels: one-hot -> scaled logits -> CRF -> argmax.
    The STEGO pipeline's usage shape (cluster predictions in, smoothed
    predictions out)."""
    onehot = jax.nn.one_hot(labels, num_classes, axis=0, dtype=jnp.float32)  # (C, H, W)
    logits = (onehot - 0.5) * 2 * confidence
    refined = meanfield_crf(logits, image, **kw)
    return jnp.argmax(refined, axis=0).astype(jnp.int32)

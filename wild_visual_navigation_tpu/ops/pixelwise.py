"""Per-pixel traversability scoring — the reference's pixelwise math,
restructured for TPU.

Reference order (dino_interface.py:87-91 + quick_start.py:184-194):
bilinearly upsample the D-channel patch features to pixels, then run
the SimpleMLP over every pixel row (traversability + reconstruction
-> confidence). Restructured EXACTLY (same two-tap interpolation
weights, same layer math; bf16 rounding only — equivalence-tested in
tests/test_models.py):

  * the first Dense layer commutes with the per-channel bilinear
    upsample (both linear, acting on different axes; the interpolation
    weights sum to 1 so the bias passes through) — apply it at PATCH
    resolution and upsample the hidden preactivations;
  * all upsamples via `interpolate_bilinear_mxu` (two constant-matrix
    matmuls — the gather form materializes 4x the output);
  * remaining layers + the reconstruction MSE run on bf16 rows with
    fp32 accumulation — the (N, 1+D) fp32 output (309 MB/frame at
    448 px) never materializes.

Measured on v5e-1 (benchmarks/exp_pixelwise_variants.py @448, B4):
naive gather form 84 img/s -> MXU bilinear 248 -> this 273.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.confidence_generator import ConfidenceConfig, confidence_inference
from .resize import interpolate_bilinear_mxu


def _dense_layers(mlp_params: dict):
    p = mlp_params["params"]
    names = sorted((k for k in p if k.startswith("Dense_")), key=lambda k: int(k.split("_")[1]))
    return [(p[k]["kernel"], p[k]["bias"]) for k in names]


def supports_optimized(mlp) -> bool:
    """The restructured scorer assumes the SimpleMLP layout (anonymous
    Dense_i stack, [trav || reconstruction] output)."""
    return type(mlp).__name__ == "SimpleMLP" and getattr(mlp, "reconstruction", False)


def pixelwise_score(
    mlp_params,
    feat: jnp.ndarray,
    out_h: int,
    out_w: int,
    cg_cfg: ConfidenceConfig,
    cg_state,
    optimized: bool = True,
    mlp=None,
    return_dense: bool = False,
):
    """feat: (B, D, Hp, Wp) patch features -> (trav, conf), each
    (B, out_h, out_w). SimpleMLP(reconstruction=True) params expected.

    optimized=False runs the literal reference order (requires `mlp`,
    the flax module, for `apply`) — the equivalence baseline.
    return_dense=True additionally returns the upsampled D-channel
    feature map (B, D, out_h, out_w) — bf16 in the optimized path — so
    callers that also pool per-segment features (runtime/fused.py)
    reuse it instead of upsampling twice."""
    B, D = feat.shape[0], feat.shape[1]
    if not optimized:
        assert mlp is not None
        dense = interpolate_bilinear_mxu(feat, out_h, out_w)
        flat = dense.transpose(0, 2, 3, 1).reshape(-1, D)
        out = mlp.apply(mlp_params, flat)
        trav = out[:, 0].reshape(B, out_h, out_w)
        reco = jnp.mean((out[:, 1:] - flat.astype(jnp.float32)) ** 2, axis=-1)
        conf = confidence_inference(cg_cfg, cg_state, reco).reshape(B, out_h, out_w)
        return (trav, conf, dense) if return_dense else (trav, conf)

    layers = _dense_layers(mlp_params)
    (W0, b0), mid, (Wl, bl) = layers[0], layers[1:-1], layers[-1]
    # Dense_0 at patch resolution, upsample the hidden preactivations
    h = jnp.einsum("bdhw,dk->bkhw", feat.astype(jnp.bfloat16), W0.astype(jnp.bfloat16))
    h = h + b0.astype(jnp.bfloat16)[None, :, None, None]
    h = jax.nn.relu(interpolate_bilinear_mxu(h, out_h, out_w))
    xup = interpolate_bilinear_mxu(feat.astype(jnp.bfloat16), out_h, out_w)
    rows = h.transpose(0, 2, 3, 1).reshape(-1, h.shape[1])
    xrows = xup.transpose(0, 2, 3, 1).reshape(-1, D)
    for W, b in mid:
        rows = jax.nn.relu(rows @ W.astype(jnp.bfloat16) + b.astype(jnp.bfloat16))
    out = rows @ Wl.astype(jnp.bfloat16) + bl.astype(jnp.bfloat16)  # (N, 1 + D) bf16
    trav = jax.nn.sigmoid(out[:, 0].astype(jnp.float32)).reshape(B, out_h, out_w)
    diff = out[:, 1:] - xrows
    reco = jnp.einsum("nd,nd->n", diff, diff, preferred_element_type=jnp.float32) / D
    conf = confidence_inference(cg_cfg, cg_state, reco).reshape(B, out_h, out_w)
    return (trav, conf, xup) if return_dense else (trav, conf)

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
naive gather form 84 img/s -> MXU bilinear 248 -> restructured 273.
bench.py (@448, B8): restructured 310 -> gram 321 img/s.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.confidence_generator import ConfidenceConfig, confidence_inference
from .resize import (
    interpolate_bilinear_mxu,
    interpolate_bilinear_mxu_nhwc,
    interpolate_bilinear_mxu_precise,
    interpolate_norm_sq_mxu,
)

_HIGH = jax.lax.Precision.HIGHEST


def _dense_layers(mlp_params: dict):
    p = mlp_params["params"]
    names = sorted((k for k in p if k.startswith("Dense_")), key=lambda k: int(k.split("_")[1]))
    return [(p[k]["kernel"], p[k]["bias"]) for k in names]


def supports_optimized(mlp) -> bool:
    """The restructured scorer assumes the SimpleMLP layout (anonymous
    Dense_i stack, [1-channel sigmoid trav || reconstruction] output)
    with at least two Dense layers — a depth-1 head would alias
    layers[0] and layers[-1] in the Dense_0-commutes restructuring."""
    return (
        type(mlp).__name__ == "SimpleMLP"
        and getattr(mlp, "reconstruction", False)
        and getattr(mlp, "nr_sigmoid_layers", None) == 1
        and len(getattr(mlp, "hidden_sizes", ())) >= 2
    )


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
    method: str | None = None,
):
    """feat: (B, D, Hp, Wp) patch features -> (trav, conf), each
    (B, out_h, out_w). SimpleMLP(reconstruction=True) params expected.

    method selects the scoring order (all the same math):
      * "reference" (= optimized=False; requires `mlp` for `apply`) —
        the literal reference order, the equivalence baseline;
      * "restructured" — Dense_0 at patch res by linearity, MXU
        bilinear, bf16 rows, fused MSE (the r3 path, 84 -> 273 img/s);
      * "gram" — additionally never materializes the D-channel
        pixel-resolution tensors: the reconstruction MSE
        ||r - x_up||² is expanded as rows·(M rows + 2v - 2z) + c - 2s
        + ||x_up||², where M = Wr Wrᵀ (K×K), z = upsample(Wr feat)
        (K channels, by linearity), s = upsample(br·feat), and
        ||x_up||² comes from interpolate_norm_sq_mxu's Gram maps.
        Cancelling terms run in fp32 at HIGHEST matmul precision, so
        accuracy matches "restructured" (tests/test_models.py);
      * "fused" (default when the shape qualifies and return_dense is
        not requested; falls back to "gram" otherwise) — the Gram math
        with everything after the patch-resolution precomputes in ONE
        Pallas kernel, so no pixel-resolution tensor except the two
        (H, W) output maps ever exists in HBM (ops/pixelwise_fused.py).

    return_dense=True additionally returns the upsampled D-channel
    feature map (B, D, out_h, out_w) — bf16 in the optimized paths —
    for callers that need the dense features themselves. The fused
    production path does NOT use it: per-segment pooling of the
    upsampled features is computed at patch resolution too
    (ops/segment_ops.py::segment_mean_pool_upsampled)."""
    if method is None:
        method = "fused" if optimized else "reference"
    B, D = feat.shape[0], feat.shape[1]
    if method == "fused":
        from .pixelwise_fused import pixelwise_score_fused, supports_fused

        if not return_dense and supports_fused(mlp_params, feat.shape, out_h, out_w):
            trav, reco = pixelwise_score_fused(mlp_params, feat, out_h, out_w)
            conf = confidence_inference(cg_cfg, cg_state, reco.reshape(-1)).reshape(
                B, out_h, out_w
            )
            return trav, conf
        method = "gram"  # didn't qualify — same math, XLA form
    if method == "reference":
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
    # Dense_0 at patch resolution, upsample the hidden preactivations.
    # Channels-LAST end to end: the (B, H, W, K) -> (N, K) reshape is
    # free, where the NCHW order pays a ~100 MB/frame transpose.
    hp = jnp.einsum("bdhw,dk->bhwk", feat.astype(jnp.bfloat16), W0.astype(jnp.bfloat16))
    hp = hp + b0.astype(jnp.bfloat16)
    h = jax.nn.relu(interpolate_bilinear_mxu_nhwc(hp, out_h, out_w))
    rows = h.reshape(-1, h.shape[-1])
    for W, b in mid:
        rows = jax.nn.relu(rows @ W.astype(jnp.bfloat16) + b.astype(jnp.bfloat16))

    if method == "restructured":
        xup = interpolate_bilinear_mxu(feat.astype(jnp.bfloat16), out_h, out_w)
        xrows = xup.transpose(0, 2, 3, 1).reshape(-1, D)
        out = rows @ Wl.astype(jnp.bfloat16) + bl.astype(jnp.bfloat16)  # (N, 1 + D)
        trav = jax.nn.sigmoid(out[:, 0].astype(jnp.float32)).reshape(B, out_h, out_w)
        diff = out[:, 1:] - xrows
        reco = jnp.einsum("nd,nd->n", diff, diff, preferred_element_type=jnp.float32) / D
        conf = confidence_inference(cg_cfg, cg_state, reco).reshape(B, out_h, out_w)
        return (trav, conf, xup) if return_dense else (trav, conf)

    assert method == "gram", method
    K = rows.shape[1]
    rows32 = rows.astype(jnp.float32)  # (N, K)
    Wl32, bl32 = Wl.astype(jnp.float32), bl.astype(jnp.float32)
    trav_logit = rows32 @ Wl32[:, 0] + bl32[0]
    trav = jax.nn.sigmoid(trav_logit).reshape(B, out_h, out_w)
    Wr, br = Wl32[:, 1:], bl32[1:]  # (K, D), (D,)
    # ||r - x||² = rowsᵀ M rows + 2 rows·(v - z) + c - 2 s + ||x||²,
    # r = Wrᵀ rows + br, x = upsample(feat). All pixel-res tensors are
    # K-channel (K=32) instead of D-channel (D=384).
    M = jnp.einsum("kd,ld->kl", Wr, Wr, precision=_HIGH)
    v = Wr @ br
    c = br @ br
    feat32 = feat.astype(jnp.float32)
    zp = jnp.einsum("bdhw,kd->bhwk", feat32, Wr, precision=_HIGH)  # (B, Hp, Wp, K)
    sp = jnp.einsum("bdhw,d->bhw", feat32, br)
    z = interpolate_bilinear_mxu_nhwc(zp, out_h, out_w, precision=_HIGH)
    s = interpolate_bilinear_mxu_precise(sp[:, None], out_h, out_w)[:, 0]
    zrows = z.reshape(-1, K)
    rM = jnp.einsum("nk,kl->nl", rows32, M, precision=_HIGH)
    lin = rM + 2.0 * (v[None, :] - zrows)
    reco = (
        jnp.einsum("nk,nk->n", rows32, lin)
        + c
        - 2.0 * s.reshape(-1)
        + interpolate_norm_sq_mxu(feat32, out_h, out_w).reshape(-1)
    ) / D
    reco = jnp.maximum(reco, 0.0)  # exact value is a squared norm
    conf = confidence_inference(cg_cfg, cg_state, reco).reshape(B, out_h, out_w)
    if return_dense:
        xup = interpolate_bilinear_mxu(feat.astype(jnp.bfloat16), out_h, out_w)
        return trav, conf, xup
    return trav, conf


def pixelwise_map_rows_chunked(score_fn, feat, out_h: int, out_w: int,
                               target_rows: int = 32):
    """Apply an arbitrary per-row scorer over every pixel of the
    bilinearly-upsampled feature map WITHOUT materializing the
    (D, out_h, out_w) tensor.

    The Gram/fused scorers (above) serve SimpleMLP heads only; heads
    whose math doesn't restructure (LinearRnvp anomaly likelihood,
    custom models) previously paid the full pixel-resolution upsample
    (~300 MB/frame fp32 at 448 px) plus every pixel-resolution
    intermediate inside the head. This runs the same exact math in
    output-row bands under `lax.map`: each band upsamples
    (target_rows, out_w) pixels straight from patch resolution (the
    two-tap H-weights of those rows are a slice of the interpolation
    matrix) and scores its rows, so live pixel-resolution state is one
    band, not the frame.

    Args:
        score_fn: (N, D) feature rows -> pytree of (N,) arrays.
        feat: (1, D, Hp, Wp) patch-resolution features.
        target_rows: output rows per band (out_h is padded up to a
            multiple; padded rows score zero-features and are dropped).

    Returns:
        The score_fn pytree with every leaf reshaped to (out_h, out_w).
    """
    import numpy as np

    from .resize import _bilinear_matrix_np

    B, D, Hp, Wp = feat.shape
    if B != 1:
        raise ValueError(
            f"pixelwise_map_rows_chunked scores one image (got batch {B}); "
            f"vmap over the batch axis instead"
        )
    rows = max(1, min(out_h, target_rows))
    n_chunks = -(-out_h // rows)
    pad = n_chunks * rows - out_h
    Mh = _bilinear_matrix_np(out_h, Hp)
    if pad:
        Mh = np.concatenate([Mh, np.zeros((pad, Hp), np.float32)], axis=0)
    Mh_c = jnp.asarray(Mh.reshape(n_chunks, rows, Hp), feat.dtype)
    Mw = jnp.asarray(_bilinear_matrix_np(out_w, Wp), feat.dtype)
    x = feat[0]

    def one_band(Mhc):
        band = jnp.einsum("rh,dhw->drw", Mhc, x)
        band = jnp.einsum("pw,drw->rpd", Mw, band)  # channels-last rows
        return score_fn(band.reshape(rows * out_w, D))

    outs = jax.lax.map(one_band, Mh_c)
    return jax.tree_util.tree_map(
        lambda t: t.reshape(n_chunks * rows, out_w)[:out_h], outs
    )

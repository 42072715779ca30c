"""Fused per-frame program: segmentation + backbone + pooling + head.

The facade (feature_extractor/feature_extractor.py) composes its stages
as separate jitted calls — fine on a local chip, but every dispatch
costs host/tunnel latency and forfeits cross-stage fusion. This module
builds ONE XLA program for the whole per-frame inference path:

    image -> resize/normalize -> ViT dense features -> SLIC/grid
    segmentation -> per-segment pooling + adjacency + centers ->
    MLP traversability + confidence -> per-pixel maps

so a camera frame is a single device round-trip (plus the params
pytree already resident). This is the production path of WVNRuntime
(use_fused=True); the composed facade remains for stego/torchvision
modes and introspection.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import apply_model, model_needs_edges
from ..models.vit import dense_features
from ..ops import segment_ops
from ..ops.resize import (
    imagenet_normalize,
    interpolate_bilinear,
    interpolate_bilinear_mxu,
    resize_image,
)
from ..ops.pixelwise import pixelwise_map_rows_chunked, pixelwise_score
from ..ops.pixelwise import supports_optimized as pixelwise_supports
from ..ops.slic import slic_batch
from ..utils.confidence_generator import ConfidenceConfig, confidence_inference


def _score_rows(mlp, mlp_params, cg_cfg, cg_state, x, anomaly: bool,
                edges=None, edge_valid=None):
    """(N, D) feature rows -> (trav (N,), conf (N,)). Branches on the
    head's output contract: SimpleMLP/DoubleMLP return the
    [trav || reconstruction] array; LinearRnvp (anomaly mode) returns
    {z, log_det, logprob} and traversability IS the calibrated flow
    likelihood (reference wvn_feature_extractor_node.py:335-338).
    Graph heads (SimpleGCN) take the frame's segment adjacency."""
    out = apply_model(mlp, mlp_params, x, edges, edge_valid)
    if anomaly:
        losses = jnp.sum(out["logprob"], axis=-1) + out["log_det"]
        trav = confidence_inference(cg_cfg, cg_state, -losses)
        return trav, jnp.ones_like(trav)
    trav = out[:, 0]
    reco = jnp.mean((out[:, 1:] - x) ** 2, axis=-1)
    return trav, confidence_inference(cg_cfg, cg_state, reco)


class FrameResult(NamedTuple):
    traversability: jnp.ndarray  # (H, W)
    confidence: jnp.ndarray  # (H, W)
    features: jnp.ndarray  # (S, D) pooled
    feat_valid: jnp.ndarray  # (S,)
    segments: jnp.ndarray  # (H, W) int32
    edges: jnp.ndarray  # (2, E)
    edge_valid: jnp.ndarray  # (E,)
    centers: jnp.ndarray  # (S, 2)


def build_fused_frame_fn(
    vit,
    mlp,
    cg_cfg: ConfidenceConfig,
    input_size: int,
    segmentation_type: str = "slic",
    num_segments: int = 100,
    slic_compactness: float = 10.0,
    slic_iterations: int = 10,
    cell_size: int = 32,
    max_edges: int = 1024,
    prediction_per_pixel: bool = True,
    score_at_patch_res: bool = False,
    anomaly: bool = False,
    jit_compile: bool = True,
    input_width: int | None = None,
):
    """Returns fn(vit_params, mlp_params, cg_state, img) ->
    FrameResult (jitted unless jit_compile=False — the raw body is
    composable into larger programs, e.g. frame+buffer-insert).
    img: (1, 3, H0, W0) in [0, 1]; output maps are
    (input_size, input_width or input_size). Square configs keep the
    reference's resize-smaller-edge + center-crop preprocessing;
    rectangular configs resize to exactly (H, W) like the composed
    path (both dims must be patch-aligned so the ViT sees the full
    field of view).

    score_at_patch_res: score per PATCH token and bilinearly upsample
    the 1-channel trav/confidence maps, instead of upsampling the
    D-channel features to pixels and scoring every pixel (the
    reference's order, dino_interface.py:87-91 + per-pixel MLP). The
    per-pixel D-channel upsample materializes D*H*W fp32 (~300 MB at
    448 px) and runs the MLP over H*W rows; patch-res scoring cuts both
    by (patch_size)^2. Mathematically different (MLP o upsample vs
    upsample o MLP — the MLP is nonlinear), so it is opt-in and covered
    by a tolerance test; feature pooling then uses the patch grid
    (segmentation sampled at patch centers)."""
    H = input_size
    W = input_width or input_size
    if W != H:
        ps = vit.cfg.patch_size
        if H % ps or W % ps:
            raise ValueError(
                f"rectangular fused config must be patch-aligned: "
                f"{H}x{W} with patch {ps}"
            )
    S = num_segments

    def _preprocess(img):
        # resize_image: square targets keep the reference's
        # resize-smaller-edge + center-crop; rectangles resize directly
        return resize_image(img, H, W)

    def _segments(x):
        """(B, 3, H, W) resized [0,1] -> (B, H, W) int32. Batched at
        this level so a faster batched SLIC impl can slot in
        (ops/slic.py::slic_batch; the fused-kernel attempt measured
        slower and "auto" stays on the XLA path)."""
        if segmentation_type == "slic":
            return slic_batch(x, num_components=S, compactness=slic_compactness,
                              iterations=slic_iterations)
        if segmentation_type == "grid":
            return jnp.broadcast_to(
                segment_ops.segment_grid(H, W, cell_size)[None],
                (x.shape[0], H, W),
            )
        # 'none' (pixelwise) deliberately NOT served here: its
        # "segments" are the H*W pixels, so pooling/adjacency would
        # need the very pixel-resolution tensors the fused program
        # exists to avoid (and the adjacency pair hash caps at ~46k
        # ids). The composed facade handles it exactly
        # (segment_pixelwise + pixelwise_edges).
        raise ValueError(f"fused path does not support segmentation [{segmentation_type}]")

    def tail(mlp_params, cg_state, feat, seg):
        """Post-backbone per-image tail: pooling + scoring over the
        precomputed segmentation. feat: (1, D, Hp, Wp); seg: (H, W)."""
        if segmentation_type == "grid":
            # adjacency/centroids of a constant grid: trace-time numpy
            # constants instead of per-frame one-hot matmuls + key sort
            edges, edge_valid, centers, center_valid = segment_ops.grid_constants(
                H, W, cell_size, S, max_edges=max_edges
            )
        else:
            edges, edge_valid = segment_ops.adjacency_list(seg, S, max_edges=max_edges)
            centers, center_valid = segment_ops.segment_centers(seg, S)

        if model_needs_edges(mlp):
            # Graph heads score per SEGMENT over the frame's adjacency
            # (the reference's GCN consumes pyg graphs, not pixel rows);
            # maps broadcast per-segment scores
            pooled, counts = segment_ops.segment_mean_pool_upsampled(
                feat[0].astype(jnp.float32), seg, S, H, W
            )
            trav_seg, conf_seg = _score_rows(
                mlp, mlp_params, cg_cfg, cg_state, pooled, anomaly,
                edges=edges, edge_valid=edge_valid,
            )
            sid = seg.clip(0, S - 1)
            return FrameResult(
                traversability=trav_seg[sid],
                confidence=conf_seg[sid],
                features=pooled,
                feat_valid=counts > 0,
                segments=seg,
                edges=edges,
                edge_valid=edge_valid,
                centers=centers,
            )

        if score_at_patch_res:
            _, D, Hp, Wp = feat.shape
            ph, pw = H // Hp, W // Wp
            # segmentation sampled at patch centers for pooling
            seg_p = seg[ph // 2 :: ph, pw // 2 :: pw][:Hp, :Wp]
            pooled, counts = segment_ops.segment_mean_pool(feat[0], seg_p, S)
            flat = feat[0].reshape(D, -1).T  # (Hp*Wp, D)
            trav_r, conf_r = _score_rows(mlp, mlp_params, cg_cfg, cg_state, flat, anomaly)
            trav_p = trav_r.reshape(1, 1, Hp, Wp)
            conf_p = conf_r.reshape(1, 1, Hp, Wp)
            if prediction_per_pixel:
                trav = interpolate_bilinear(trav_p, H, W)[0, 0]
                conf = interpolate_bilinear(conf_p, H, W)[0, 0]
            else:
                trav_seg, conf_seg = _score_rows(mlp, mlp_params, cg_cfg, cg_state, pooled, anomaly)
                sid = seg.clip(0, S - 1)
                trav = trav_seg[sid]
                conf = conf_seg[sid]
            return FrameResult(
                traversability=trav,
                confidence=conf,
                features=pooled,
                feat_valid=counts > 0,
                segments=seg,
                edges=edges,
                edge_valid=edge_valid,
                centers=centers,
            )

        if prediction_per_pixel and not anomaly and pixelwise_supports(mlp):
            # Gram per-pixel scorer (ops/pixelwise.py): exact reference
            # math with every D-channel tensor kept at PATCH resolution
            # — Dense_0 commutes with the bilinear upsample, and the
            # reconstruction MSE expands through the K×K Gram matrix of
            # the last layer. Per-segment pooling of the upsampled
            # features likewise contracts the adjoint-downsampled
            # one-hot masks against the patch features, so the
            # (D, H, W) map never exists in the frame program.
            trav_b, conf_b = pixelwise_score(
                mlp_params, feat, H, W, cg_cfg, cg_state, optimized=True
            )
            pooled, counts = segment_ops.segment_mean_pool_upsampled(
                feat[0].astype(jnp.float32), seg, S, H, W
            )
            return FrameResult(
                traversability=trav_b[0],
                confidence=conf_b[0],
                features=pooled,
                feat_valid=counts > 0,
                segments=seg,
                edges=edges,
                edge_valid=edge_valid,
                centers=centers,
            )

        # Generic per-pixel path (anomaly flows, custom heads): pooling
        # contracts at patch resolution (segment_mean_pool_upsampled)
        # and scoring runs in row bands (pixelwise_map_rows_chunked),
        # so the (D, H, W) upsampled map — ~300 MB/frame fp32 at
        # 448 px, plus every pixel-resolution intermediate inside the
        # head — never exists in HBM.
        pooled, counts = segment_ops.segment_mean_pool_upsampled(
            feat[0].astype(jnp.float32), seg, S, H, W
        )
        if prediction_per_pixel:
            trav, conf = pixelwise_map_rows_chunked(
                lambda rows: _score_rows(mlp, mlp_params, cg_cfg, cg_state, rows, anomaly),
                feat, H, W,
            )
        else:
            trav_seg, conf_seg = _score_rows(mlp, mlp_params, cg_cfg, cg_state, pooled, anomaly)
            sid = seg.clip(0, S - 1)
            trav = trav_seg[sid]
            conf = conf_seg[sid]

        return FrameResult(
            traversability=trav,
            confidence=conf,
            features=pooled,
            feat_valid=counts > 0,
            segments=seg,
            edges=edges,
            edge_valid=edge_valid,
            centers=centers,
        )

    def frame(vit_params, mlp_params, cg_state, img):
        # uint8 camera frames upload 4x less data than float32; the
        # [0,1] conversion happens on device (dtype is trace-static).
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0
        x = _preprocess(img)
        xn = imagenet_normalize(x)
        feat = dense_features(vit, vit_params, xn)  # (1, D, Hp, Wp)
        return tail(mlp_params, cg_state, feat, _segments(x)[0])

    def frames_batch(vit_params, mlp_params, cg_state, imgs, mesh=None):
        """Natively-batched multi-camera variant: the BACKBONE runs on
        the full (B, ...) batch un-vmapped — so attention "auto"
        resolves against the true batch (under vmap it saw B=1 and
        fell back off the flash kernel) and the whole batch is one set
        of big MXU matmuls; only the cheap per-image tail is vmapped.
        dp-shards frames over the mesh when one is given."""
        if imgs.dtype == jnp.uint8:
            imgs = imgs.astype(jnp.float32) / 255.0
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            imgs = jax.lax.with_sharding_constraint(
                imgs, NamedSharding(mesh, PartitionSpec("dp"))
            )
        x = _preprocess(imgs)
        xn = imagenet_normalize(x)
        feat = dense_features(vit, vit_params, xn)  # (B, D, Hp, Wp)
        segs = _segments(x)  # (B, H, W)
        return jax.vmap(lambda f, sg: tail(mlp_params, cg_state, f[None], sg))(feat, segs)

    frame.frames_batch = frames_batch
    return jax.jit(frame) if jit_compile else frame


def build_fused_stego_frame_fn(
    stego,
    mlp,
    cg_cfg: ConfidenceConfig,
    input_size: int,
    max_edges: int = 1024,
    prediction_per_pixel: bool = True,
    jit_compile: bool = True,
    input_width: int | None = None,
):
    """Fused STEGO production path (VERDICT r1 weak #7): ONE program for
    image -> resize/normalize -> ViT-B/8 -> STEGO code head -> per-image
    cosine k-means clustering -> code pooling + adjacency + centers ->
    MLP traversability + confidence (the reference's stego/stego mode,
    feature_extractor.py:237-249, previously paid the multi-dispatch
    facade cost here).

    Returns fn(stego_params, mlp_params, cg_state, img) -> FrameResult,
    where stego_params = (backbone_params, head_params). Segments are
    the per-image k-means clusters (S = stego.n_image_clusters);
    features are the 90-d code pooled per cluster at patch resolution.
    """
    import jax.random as jrandom

    from ..feature_extractor.stego import cosine_kmeans

    H = input_size
    W = input_width or input_size
    S = stego._n_image_clusters
    vit = stego.vit
    head = stego.head
    if W != H:
        ps = vit.cfg.patch_size
        if H % ps or W % ps:
            raise ValueError(
                f"rectangular fused stego config must be patch-aligned: "
                f"{H}x{W} with patch {ps}"
            )

    def tail(mlp_params, cg_state, code, hp, wp):
        """Per-image tail from the (N, 90) STEGO code: k-means
        clustering, segmentation, pooling, scoring."""
        labels, _ = cosine_kmeans(code, jrandom.PRNGKey(0), n_clusters=S)
        seg_p = labels.reshape(hp, wp).astype(jnp.int32)

        # nearest-upsample the patch segmentation to pixels (integer
        # floor map — the exact map upsampled_adjacency_and_centers
        # assumes)
        iy = (jnp.arange(H) * hp) // H
        ix = (jnp.arange(W) * wp) // W
        seg = seg_p[iy, :][:, ix]

        code_hw = code.reshape(hp, wp, -1).transpose(2, 0, 1)  # (90, hp, wp)
        pooled, counts = segment_ops.segment_mean_pool(code_hw, seg_p, S)
        # adjacency + pixel-space centroids computed at patch resolution
        # (exact for nearest-upsampled labels; saves the O(H*W) one-hot,
        # ~3.8 ms/img at 448 px — exp_stego_decompose.py stage 5)
        edges, edge_valid, centers, center_valid = (
            segment_ops.upsampled_adjacency_and_centers(
                seg_p, S, H, W, max_edges=max_edges
            )
        )

        if model_needs_edges(mlp):
            # graph heads: per-segment scoring over the cluster adjacency
            trav_seg, conf_seg = _score_rows(
                mlp, mlp_params, cg_cfg, cg_state, pooled, False,
                edges=edges, edge_valid=edge_valid,
            )
            sid = seg.clip(0, S - 1)
            trav = trav_seg[sid]
            conf = conf_seg[sid]
        elif prediction_per_pixel and pixelwise_supports(mlp):
            # Same Gram restructuring as the dino path: the 90-channel
            # code never materializes at pixel resolution.
            trav_b, conf_b = pixelwise_score(
                mlp_params, code_hw[None], H, W, cg_cfg, cg_state, optimized=True
            )
            trav, conf = trav_b[0], conf_b[0]
        elif prediction_per_pixel:
            dense = interpolate_bilinear_mxu(code_hw[None], H, W)[0]  # (90, H, W)
            flat = dense.reshape(dense.shape[0], -1).T
            out_m = mlp.apply(mlp_params, flat)
            trav = out_m[:, 0].reshape(H, W)
            reco = jnp.mean((out_m[:, 1:] - flat) ** 2, axis=-1)
            conf = confidence_inference(cg_cfg, cg_state, reco).reshape(H, W)
        else:
            out_m = mlp.apply(mlp_params, pooled)
            reco = jnp.mean((out_m[:, 1:] - pooled) ** 2, axis=-1)
            conf_seg = confidence_inference(cg_cfg, cg_state, reco)
            sid = seg.clip(0, S - 1)
            trav = out_m[:, 0][sid]
            conf = conf_seg[sid]

        return FrameResult(
            traversability=trav,
            confidence=conf,
            features=pooled,
            feat_valid=counts > 0,
            segments=seg,
            edges=edges,
            edge_valid=edge_valid,
            centers=centers,
        )

    def _backbone(bparams, hparams, img):
        """(B, 3, ?, ?) float images -> ((B, N, 90) codes, grid)."""
        x = resize_image(img, H, W)
        xn = imagenet_normalize(x)
        out = vit.apply(bparams, xn)
        res = head.apply(hparams, out["patch_tokens"])
        return res["code"], out["grid"]

    def frame(stego_params, mlp_params, cg_state, img):
        bparams, hparams = stego_params
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0
        codes, (hp, wp) = _backbone(bparams, hparams, img)
        return tail(mlp_params, cg_state, codes[0], hp, wp)

    def frames_batch(stego_params, mlp_params, cg_state, imgs, mesh=None):
        """Natively-batched multi-camera variant (mirrors the dino
        path): the ViT-B/8 backbone + code head run un-vmapped on the
        full (B, ...) batch — attention "auto" resolves against the
        true batch size (under vmap it saw B=1 and fell back off the
        flash kernel; at S=3137 flash wins 58.9 vs 72.4 ms) — and only
        the cheap per-image tail (k-means, pooling, scoring) is
        vmapped. dp-shards frames over the mesh when one is given."""
        bparams, hparams = stego_params
        if imgs.dtype == jnp.uint8:
            imgs = imgs.astype(jnp.float32) / 255.0
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            imgs = jax.lax.with_sharding_constraint(
                imgs, NamedSharding(mesh, PartitionSpec("dp"))
            )
        codes, (hp, wp) = _backbone(bparams, hparams, imgs)
        return jax.vmap(lambda c: tail(mlp_params, cg_state, c, hp, wp))(codes)

    frame.frames_batch = frames_batch
    return jax.jit(frame) if jit_compile else frame


def build_fused_torchvision_frame_fn(
    tvi,
    mlp,
    cg_cfg: ConfidenceConfig,
    input_size: int,
    segmentation_type: str = "slic",
    num_segments: int = 100,
    slic_compactness: float = 10.0,
    slic_iterations: int = 10,
    cell_size: int = 32,
    max_edges: int = 1024,
    jit_compile: bool = True,
    input_width: int | None = None,
):
    """Fused CNN-pyramid path: image -> resize/normalize -> resnet/
    efficientnet feature pyramid -> SLIC/grid segmentation -> multiscale
    per-segment pooling (with centroid fallback at coarse scales) ->
    per-segment MLP scoring, one program. The reference's torchvision
    mode is inherently per-segment (multiscale sparsify,
    feature_extractor.py:314-366), so the trav/confidence maps are the
    per-segment scores gathered over the segmentation.

    Returns fn(tv_params, mlp_params, cg_state, img) -> FrameResult.
    """
    H = input_size
    W = input_width or input_size
    S = num_segments
    model = tvi.model

    def _segments(x):
        """(B, 3, H, W) resized [0,1] -> (B, H, W) int32 (batched —
        see the dino builder's _segments note)."""
        if segmentation_type == "slic":
            return slic_batch(x, num_components=S, compactness=slic_compactness,
                              iterations=slic_iterations)
        if segmentation_type == "grid":
            return jnp.broadcast_to(
                segment_ops.segment_grid(H, W, cell_size)[None],
                (x.shape[0], H, W),
            )
        raise ValueError(f"fused torchvision path does not support segmentation [{segmentation_type}]")

    def tail(mlp_params, cg_state, pyr_i, seg):
        """Per-image tail: multiscale pooling + scoring over the
        precomputed segmentation. pyr_i: {name: (C_i, H_i, W_i)}."""
        if segmentation_type == "grid":
            edges, edge_valid, centers, _cv = segment_ops.grid_constants(
                H, W, cell_size, S, max_edges=max_edges
            )
        else:
            edges, edge_valid = segment_ops.adjacency_list(seg, S, max_edges=max_edges)
            centers, _ = segment_ops.segment_centers(seg, S)

        pooled, seg_valid = segment_ops.segment_pyramid_pool(pyr_i, seg, S)

        trav_seg, conf_seg = _score_rows(mlp, mlp_params, cg_cfg, cg_state, pooled,
                                         anomaly=False, edges=edges, edge_valid=edge_valid)
        sid = seg.clip(0, S - 1)
        return FrameResult(
            traversability=trav_seg[sid],
            confidence=conf_seg[sid],
            features=pooled,
            feat_valid=seg_valid,
            segments=seg,
            edges=edges,
            edge_valid=edge_valid,
            centers=centers,
        )

    def _backbone(tv_params, img):
        x = resize_image(img, H, W)
        xn = imagenet_normalize(x)
        return model.apply(tv_params, xn), x  # {name: (B, C_i, H_i, W_i)}, (B, 3, H, W)

    def frame(tv_params, mlp_params, cg_state, img):
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0
        pyr, x = _backbone(tv_params, img)
        return tail(mlp_params, cg_state, {k: v[0] for k, v in pyr.items()},
                    _segments(x)[0])

    def frames_batch(tv_params, mlp_params, cg_state, imgs, mesh=None):
        """Natively-batched multi-camera variant: the CNN pyramid runs
        un-vmapped on the full (B, ...) batch (convs batch natively on
        the MXU); only the per-image tail (SLIC, pooling, scoring) is
        vmapped. dp-shards frames over the mesh when one is given."""
        if imgs.dtype == jnp.uint8:
            imgs = imgs.astype(jnp.float32) / 255.0
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            imgs = jax.lax.with_sharding_constraint(
                imgs, NamedSharding(mesh, PartitionSpec("dp"))
            )
        pyr, x = _backbone(tv_params, imgs)
        segs = _segments(x)
        return jax.vmap(lambda p, sg: tail(mlp_params, cg_state, p, sg))(pyr, segs)

    frame.frames_batch = frames_batch
    return jax.jit(frame) if jit_compile else frame


def build_fused_batch_fn(vit, mlp):
    """Bare backbone+score batched program for BENCHMARK stage
    isolation: (B, 3, H, W) already at network size -> per-PATCH trav
    maps, no resize/segmentation/confidence (the production batched
    path is build_fused_frame_fn(...).frames_batch). Shapes specialize
    at the first call."""

    @jax.jit
    def frames(vit_params, mlp_params, imgs):
        if imgs.dtype == jnp.uint8:
            imgs = imgs.astype(jnp.float32) / 255.0
        xn = imagenet_normalize(imgs)
        feat = dense_features(vit, vit_params, xn)  # (B, D, Hp, Wp)
        B, D, Hp, Wp = feat.shape
        flat = feat.transpose(0, 2, 3, 1).reshape(-1, D)
        out = mlp.apply(mlp_params, flat)
        return out[:, 0].reshape(B, Hp, Wp)

    return frames

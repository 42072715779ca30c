"""Segment (superpixel) ops: pooling, adjacency, centroids, generators.

TPU-native replacements for three reference components:
  * `FeatureExtractor.sparsify_features` python-per-segment loop
    (/root/reference/wild_visual_navigation/feature_extractor/feature_extractor.py:390-396)
    -> one-hot matmul segment mean that runs on the MXU.
  * `SegmentExtractor.adjacency_list/centers`
    (feature_extractor/segment_extractor.py:39-92) -> shifted-compare +
    fixed-size `jnp.unique`, and segment-sum centroids.
  * the grid / pixelwise / random segmentation generators
    (feature_extractor.py:179-235).

All outputs are fixed-shape (padded to a static `num_segments`) with
validity masks — the framework-wide convention replacing the
reference's dynamic per-image segment counts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_segments",))
def segment_mean_pool(dense_features: jnp.ndarray, seg: jnp.ndarray, num_segments: int):
    """Mean-pool dense features per segment via a one-hot matmul (MXU).

    Args:
        dense_features: (D, H, W) float.
        seg: (H, W) int32 segment ids in [0, num_segments) or -1 for
            "unassigned" pixels (random segmentation mode).
        num_segments: static segment capacity S.

    Returns:
        feat: (S, D) per-segment mean features (0 for empty segments).
        counts: (S,) pixel counts per segment.
    """
    D = dense_features.shape[0]
    X = dense_features.reshape(D, -1).T  # (HW, D)
    ids = seg.reshape(-1)
    onehot = jax.nn.one_hot(ids, num_segments, dtype=X.dtype)  # (HW, S); -1 -> all zeros
    sums = jnp.dot(onehot.T, X, preferred_element_type=jnp.float32)  # (S, D)
    counts = jnp.sum(onehot, axis=0)  # (S,)
    feat = sums / jnp.maximum(counts[:, None], 1.0)
    return feat, counts


@partial(jax.jit, static_argnames=("num_segments", "out_h", "out_w"))
def segment_mean_pool_upsampled(
    feat: jnp.ndarray, seg: jnp.ndarray, num_segments: int, out_h: int, out_w: int
):
    """Per-segment mean of the bilinear-UPSAMPLED patch features,
    without materializing the upsampled map.

    Exactly `segment_mean_pool(interpolate_bilinear_mxu(feat[None],
    out_h, out_w)[0], seg, S)` by linearity of the upsample: the
    per-segment pixel sum of `up(feat)` is a patch-space contraction
    with the ADJOINT-upsampled one-hot masks,
    Σ_{p∈s} up(feat)_p = Σ_i (Σ_{p∈s} U[p, i]) feat_i.
    The (D, out_h, out_w) pixel-resolution tensor — the HBM hot spot of
    the per-pixel production path — never exists; together with the
    Gram scorer (ops/pixelwise.py) the fused frame program touches
    D-channel data only at patch resolution.

    Args:
        feat: (D, Hp, Wp) patch-resolution features.
        seg: (out_h, out_w) int32 segment ids, -1 = unassigned.
        num_segments: static segment capacity S.

    Returns:
        feat_mean: (S, D) per-segment means (0 for empty segments).
        counts: (S,) pixel counts per segment (at OUTPUT resolution,
            identical to segment_mean_pool's).
    """
    from .resize import _bilinear_matrix

    D, Hp, Wp = feat.shape
    Mh = _bilinear_matrix(out_h, Hp)  # (out_h, Hp)
    Mw = _bilinear_matrix(out_w, Wp)  # (out_w, Wp)
    onehot = jax.nn.one_hot(seg, num_segments, dtype=jnp.float32)  # (H, W, S)
    t = jnp.einsum("hws,hp->pws", onehot, Mh)
    A = jnp.einsum("pws,wq->spq", t, Mw)  # adjoint-downsampled masks
    sums = jnp.einsum(
        "spq,dpq->sd", A, feat.astype(jnp.float32), preferred_element_type=jnp.float32
    )
    counts = jnp.sum(onehot, axis=(0, 1))
    feat_mean = sums / jnp.maximum(counts[:, None], 1.0)
    return feat_mean, counts


@partial(jax.jit, static_argnames=("num_segments",))
def segment_masked_mean(values: jnp.ndarray, value_valid: jnp.ndarray, seg: jnp.ndarray, num_segments: int):
    """Per-segment mean of a masked scalar field.

    The vectorized equivalent of MissionNode.update_supervision_signal
    (traversability_estimator/nodes.py:400-440): the reference builds an
    (N, M, S) one-hot broadcast; we use the same one-hot-matmul trick as
    feature pooling.

    Args:
        values: (H, W) float field (e.g. fused supervision mask).
        value_valid: (H, W) bool — which pixels carry signal.
        seg: (H, W) int32 segment ids.
        num_segments: static capacity S.

    Returns:
        mean: (S,) per-segment mean over valid pixels (0 where none).
        valid: (S,) bool — reference semantics `signal > 0`
            (nodes.py:440).
    """
    ids = seg.reshape(-1)
    onehot = jax.nn.one_hot(ids, num_segments, dtype=jnp.float32)  # (HW, S)
    v = jnp.where(value_valid, values, 0.0).reshape(-1)
    m = value_valid.reshape(-1).astype(jnp.float32)
    sums = jnp.dot(onehot.T, (v * m)[:, None], preferred_element_type=jnp.float32)[:, 0]
    counts = jnp.dot(onehot.T, m[:, None], preferred_element_type=jnp.float32)[:, 0]
    mean = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), 0.0)
    return mean, mean > 0


@partial(jax.jit, static_argnames=("num_segments",))
def segment_centers(seg: jnp.ndarray, num_segments: int):
    """Per-segment centroid in (x, y) pixel coordinates.

    Matches SegmentExtractor.centers (segment_extractor.py:69-92), which
    returns (x, y) means per segment id.

    Returns:
        centers: (S, 2) float32 (x, y); 0 for empty segments.
        valid: (S,) bool.
    """
    H, W = seg.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ids = seg.reshape(-1)
    onehot = jax.nn.one_hot(ids, num_segments, dtype=jnp.float32)
    coords = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)  # (HW, 2)
    sums = jnp.dot(onehot.T, coords, preferred_element_type=jnp.float32)
    counts = jnp.sum(onehot, axis=0)
    centers = sums / jnp.maximum(counts[:, None], 1.0)
    return centers, counts > 0


@partial(jax.jit, static_argnames=("num_segments", "max_edges", "impl"))
def adjacency_list(seg: jnp.ndarray, num_segments: int, max_edges: int = 512,
                   impl: str = "auto"):
    """Undirected adjacency of neighboring segments, fixed size.

    Matches SegmentExtractor.adjacency_list (segment_extractor.py:39-67):
    4-neighborhood boundary detection, pair-hash dedup. The reference's
    directional conv filters reduce to shifted compares; the float64
    pair hash becomes an int32 hash deduped by fixed-size `jnp.unique`.

    Returns:
        edges: (2, max_edges) int32 (left, right) pairs, padded.
        edge_valid: (max_edges,) bool.
    """
    s = seg.astype(jnp.int32)
    div = num_segments + 1
    if div * div > jnp.iinfo(jnp.int32).max:
        # the int32 pair hash a + b*div needs div^2 <= 2^31; beyond
        # ~46k segments (e.g. pixelwise ids) keys would wrap negative
        # and silently vanish behind the valid mask
        raise ValueError(
            f"adjacency_list supports at most 46339 segments (got "
            f"{num_segments}); pixelwise segmentation has no segment "
            f"adjacency — use ops.segment_ops.pixelwise_edges"
        )

    # Horizontal neighbors: (s[y, x], s[y, x+1]) where they differ.
    a_h, b_h = s[:, :-1], s[:, 1:]
    # Vertical neighbors: (s[y, x], s[y+1, x]).
    a_v, b_v = s[:-1, :], s[1:, :]

    if impl == "auto":
        impl = "matrix" if num_segments <= 256 else "hash"
    if impl == "matrix":
        if num_segments > 256:
            raise ValueError(
                f"adjacency_list impl='matrix' is gated to <= 256 segments "
                f"(S^2 key table); got {num_segments}"
            )
        # Matrix fast path: accumulate the S x S co-occurrence matrix
        # with two MXU matmuls over bf16 one-hots instead of sorting
        # ~4*H*W hash keys. jnp.unique's sort dominated the op at
        # 448 px (exp_stego_decompose.py stage 5: ~3.8 ms/img vs
        # ~0.5 ms of one-hot traffic); matrix entries are unique by
        # construction so the dedup disappears and only the S^2
        # (<= 65k) key sort remains. Exact: bf16 one-hot products are
        # 0/1, accumulated in fp32 (counts < 2^24), and only tested
        # against zero. Output layout matches the hash path EXACTLY
        # (pinned by tests/test_segment_ops.py): valid edges FIRST in
        # ascending key order, padding at the back, and truncation
        # keeps the SMALLEST keys — invalid entries sort to the back
        # as int32-max sentinels instead of -1-first.
        def cooc(a, b):
            oa = jax.nn.one_hot(a.reshape(-1), num_segments, dtype=jnp.bfloat16)
            ob = jax.nn.one_hot(b.reshape(-1), num_segments, dtype=jnp.bfloat16)
            return jnp.dot(oa.T, ob, preferred_element_type=jnp.float32)

        m = cooc(a_h, b_h) + cooc(a_v, b_v)
        m = m + m.T
        m = m * (1.0 - jnp.eye(num_segments, dtype=m.dtype))
        ai = jax.lax.broadcasted_iota(jnp.int32, (num_segments, num_segments), 0)
        bi = jax.lax.broadcasted_iota(jnp.int32, (num_segments, num_segments), 1)
        big = jnp.iinfo(jnp.int32).max  # > any key: div^2 <= 257^2
        keys_m = jnp.where(m > 0, ai + bi * div, big).reshape(-1)
        keys_m = jnp.sort(keys_m)[:max_edges]  # smallest keys, valid first
        if keys_m.shape[0] < max_edges:
            keys_m = jnp.concatenate(
                [keys_m, jnp.full((max_edges - keys_m.shape[0],), big, jnp.int32)]
            )
        valid = keys_m < big
        le = jnp.where(valid, keys_m % div, 0)
        ri = jnp.where(valid, keys_m // div, 0)
        return jnp.stack([le, ri], axis=0).astype(jnp.int32), valid

    def pairs(a, b):
        diff = (a != b) & (a >= 0) & (b >= 0)
        key = a + b * div
        # reference emits both (left,right) and (right,left) directions;
        # keep both so the undirected dedup matches.
        key2 = b + a * div
        return jnp.where(diff, key, -1).reshape(-1), jnp.where(diff, key2, -1).reshape(-1)

    h1, h2 = pairs(a_h, b_h)
    v1, v2 = pairs(a_v, b_v)
    # a literal -1 guarantees the padding value exists in the input and
    # sorts FIRST — otherwise, when every pair is a boundary (no -1 in
    # the data), jnp.unique appends its fill at the END and the slice
    # below would drop the smallest REAL key instead
    keys = jnp.concatenate([h1, h2, v1, v2, jnp.full((1,), -1, jnp.int32)])
    uniq = jnp.unique(keys, size=max_edges + 1, fill_value=-1)
    # Drop the -1 slot (sorted first).
    uniq = uniq[-max_edges:] if uniq.shape[0] > max_edges else uniq
    valid = uniq >= 0
    le = jnp.where(valid, uniq % div, 0)
    ri = jnp.where(valid, uniq // div, 0)
    return jnp.stack([le, ri], axis=0).astype(jnp.int32), valid


@partial(jax.jit, static_argnames=("num_segments", "out_h", "out_w", "max_edges"))
def upsampled_adjacency_and_centers(
    seg_p: jnp.ndarray,
    num_segments: int,
    out_h: int,
    out_w: int,
    max_edges: int = 512,
):
    """adjacency_list + segment_centers of the nearest-upsampled label
    map, computed at PATCH resolution — exactly.

    The fused stego tail nearest-upsamples its (hp, wp) k-means labels
    to (H, W) pixels with the floor map r = (y * hp) // H, then needs
    segment adjacency and pixel-space centroids. Running those on the
    upsampled map costs O(H*W) one-hot work (~3.8 ms/img at 448 px,
    the dominant non-backbone term in exp_stego_decompose.py). But the
    floor map sends each patch cell to a CONTIGUOUS pixel rectangle, so

      * two labels are 4-adjacent at pixel resolution iff they are
        4-adjacent at patch resolution -> adjacency_list(seg) and
        adjacency_list(seg_p) return the identical (sorted, deduped)
        edge set; and
      * the pixel centroid of a label is the block-weighted patch
        centroid: cell (r, c) contributes w_y[r]*w_x[c] pixels whose
        coordinate sums separate as (w_y[r]*s_x[c], s_y[r]*w_x[c]),
        where w/s are the per-row pixel counts and coordinate sums of
        the floor map (trace-time constants).

    Equivalence is pinned by tests/test_segment_ops.py for divisible
    and non-divisible (H, W) alike.

    Returns (edges, edge_valid, centers, center_valid) matching
    adjacency_list(seg_hw) + segment_centers(seg_hw).
    """
    import numpy as np

    hp, wp = seg_p.shape
    if out_h < hp or out_w < wp:
        # downsampling merges cells: patch-res adjacency would report
        # pairs the pixel map never realizes
        raise ValueError(
            f"upsampled_adjacency_and_centers requires out >= patch grid "
            f"(got {out_h}x{out_w} from {hp}x{wp})"
        )
    edges, edge_valid = adjacency_list(seg_p, num_segments, max_edges=max_edges)

    def block_sums(n_out, n_in):
        idx = (np.arange(n_out) * n_in) // n_out  # pixel -> patch row
        w = np.zeros(n_in, np.float64)
        s = np.zeros(n_in, np.float64)
        np.add.at(w, idx, 1.0)
        np.add.at(s, idx, np.arange(n_out, dtype=np.float64))
        return jnp.asarray(w, jnp.float32), jnp.asarray(s, jnp.float32)

    w_y, s_y = block_sums(out_h, hp)  # (hp,)
    w_x, s_x = block_sums(out_w, wp)  # (wp,)

    onehot = jax.nn.one_hot(seg_p.reshape(-1), num_segments, dtype=jnp.float32)
    # per-cell pixel count and coordinate sums, separable over rows/cols
    cnt = (w_y[:, None] * w_x[None, :]).reshape(-1)
    sx = (w_y[:, None] * s_x[None, :]).reshape(-1)
    sy = (s_y[:, None] * w_x[None, :]).reshape(-1)
    stacked = jnp.stack([sx, sy, cnt], axis=-1)  # (hp*wp, 3)
    agg = jnp.dot(onehot.T, stacked, preferred_element_type=jnp.float32)
    counts = agg[:, 2]
    centers = agg[:, :2] / jnp.maximum(counts[:, None], 1.0)
    return edges, edge_valid, centers, counts > 0


def segment_grid(height: int, width: int, cell_size: int = 32) -> jnp.ndarray:
    """Grid segmentation (feature_extractor.py:198-219): row-major cell ids."""
    ys = jnp.arange(height) // cell_size
    xs = jnp.arange(width) // cell_size
    ncols = -(-width // cell_size)
    return (ys[:, None] * ncols + xs[None, :]).astype(jnp.int32)


def grid_constants(
    height: int, width: int, cell_size: int, num_segments: int, max_edges: int = 512
):
    """adjacency_list + segment_centers of a segment_grid map, computed
    in numpy at trace/build time.

    A grid segmentation is a compile-time constant, but XLA does not
    constant-fold the one-hot matmuls and the key sort the generic ops
    lower to — the fused "grid" tails were paying them per frame (the
    dominant non-backbone term in the anomaly mode). The grid's
    adjacency and centroids are pure functions of (height, width,
    cell_size), so compute them here once; closed over a jitted tail
    they bake in as tiny literals ((2, max_edges) + (S, 2)).

    Output matches adjacency_list(segment_grid(...), num_segments) and
    segment_centers(...) bit-for-bit in layout and padding semantics
    (equivalence-tested in tests/test_segment_ops.py).
    """
    import numpy as np

    ncols = -(-width // cell_size)
    nrows = -(-height // cell_size)
    ncells = nrows * ncols
    if num_segments < ncells:
        raise ValueError(
            f"grid of {height}x{width}/{cell_size} has {ncells} cells but "
            f"num_segments={num_segments}; ids would alias in the pooling "
            f"one-hot and the adjacency pair hash"
        )
    div = num_segments + 1

    ys = np.arange(height) // cell_size
    xs = np.arange(width) // cell_size
    seg = (ys[:, None] * ncols + xs[None, :]).astype(np.int64)

    key_list = []
    for a, b in ((seg[:, :-1], seg[:, 1:]), (seg[:-1, :], seg[1:, :])):
        d = a != b
        key_list.append(a[d] + b[d] * div)
        key_list.append(b[d] + a[d] * div)
    keys = np.unique(np.concatenate(key_list)) if key_list else np.zeros(0, np.int64)
    # same layout as adjacency_list: valid edges first (ascending key),
    # truncation keeps the smallest keys, padding at the back
    keys = keys[:max_edges]
    uniq = np.concatenate([keys, np.full(max_edges - keys.size, -1, np.int64)])
    valid = uniq >= 0
    le = np.where(valid, uniq % div, 0)
    ri = np.where(valid, uniq // div, 0)
    edges = np.stack([le, ri], axis=0).astype(np.int32)

    cnt = np.zeros(num_segments, np.float64)
    sx = np.zeros(num_segments, np.float64)
    sy = np.zeros(num_segments, np.float64)
    yy, xx = np.mgrid[0:height, 0:width]
    np.add.at(cnt, seg.ravel(), 1.0)
    np.add.at(sx, seg.ravel(), xx.ravel().astype(np.float64))
    np.add.at(sy, seg.ravel(), yy.ravel().astype(np.float64))
    centers = np.stack([sx, sy], axis=-1) / np.maximum(cnt[:, None], 1.0)

    return (
        jnp.asarray(edges),
        jnp.asarray(valid),
        jnp.asarray(centers, jnp.float32),
        jnp.asarray(cnt > 0),
    )


def segment_pixelwise(height: int, width: int) -> jnp.ndarray:
    """Pixel-wise segmentation (feature_extractor.py:179-196)."""
    return jnp.arange(height * width, dtype=jnp.int32).reshape(height, width)


def segment_random(key: jax.Array, height: int, width: int, n_random_pixels: int = 100) -> jnp.ndarray:
    """Random-pixel segmentation (feature_extractor.py:227-235): `n`
    random pixels get ids 0..n-1, the rest are -1 (unassigned)."""
    perm = jax.random.permutation(key, height * width)[:n_random_pixels]
    seg = jnp.full((height * width,), -1, dtype=jnp.int32)
    seg = seg.at[perm].set(jnp.arange(n_random_pixels, dtype=jnp.int32))
    return seg.reshape(height, width)


def segment_pyramid_pool(pyramid: dict, seg: jnp.ndarray, num_segments: int):
    """Multiscale per-segment pooling over a CNN feature pyramid.

    The fixed-shape equivalent of the reference's multiscale sparsify
    path (feature_extractor.py:314-366): for each scale, the
    segmentation is nearest-downsampled to the feature resolution and
    segment means are pooled; segments that vanish at a coarse scale
    fall back to the feature at the segment centroid (the reference's
    prev_x/prev_y fallback, :342-353). Scale results are concatenated
    along the channel axis.

    pyramid: {name: (C_i, H_i, W_i)}; seg: (H, W) -> ((S, sum C_i), (S,) valid).
    """
    H, W = seg.shape
    centers, seg_valid = segment_centers(seg, num_segments)  # (S, 2) in (x, y)
    feats = []
    for name in sorted(pyramid.keys()):
        f = pyramid[name]
        C, Hi, Wi = f.shape
        # shared nearest-index convention with resize.resize_nearest
        from .resize import _nearest_indices

        seg_i = seg[_nearest_indices(Hi, H), :][:, _nearest_indices(Wi, W)]
        pooled, counts = segment_mean_pool(f, seg_i, num_segments)  # (S, C)
        # centroid fallback for segments that vanished at this scale
        cx = jnp.clip((centers[:, 0] * (Wi / W)).astype(jnp.int32), 0, Wi - 1)
        cy = jnp.clip((centers[:, 1] * (Hi / H)).astype(jnp.int32), 0, Hi - 1)
        fallback = f[:, cy, cx].T  # (S, C)
        feats.append(jnp.where((counts > 0)[:, None], pooled, fallback))
    return jnp.concatenate(feats, axis=-1), seg_valid


def pixelwise_edges(height: int, width: int) -> jnp.ndarray:
    """4-neighbor edges for pixelwise segmentation (feature_extractor.py:192-194)."""
    seg = segment_pixelwise(height, width)
    hor = jnp.stack([seg[:, :-1].reshape(-1), seg[:, 1:].reshape(-1)], axis=0)
    ver = jnp.stack([seg[:-1, :].reshape(-1), seg[1:, :].reshape(-1)], axis=0)
    return jnp.concatenate([hor, ver], axis=1)

"""Segment pooling / adjacency / centroid tests vs hand-computed
references (SegmentExtractor + sparsify_features semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wild_visual_navigation_tpu.ops import segment_ops


def test_segment_mean_pool():
    seg = jnp.asarray([[0, 0, 1], [2, 2, 1]], dtype=jnp.int32)
    feat = jnp.arange(2 * 2 * 3, dtype=jnp.float32).reshape(2, 2, 3)  # (D=2, H=2, W=3)
    out, counts = segment_ops.segment_mean_pool(feat, seg, num_segments=4)
    # segment 0: pixels (0,0),(0,1); segment 1: (0,2),(1,2); segment 2: (1,0),(1,1)
    np.testing.assert_allclose(np.asarray(out[0]), [(0 + 1) / 2, (6 + 7) / 2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), [(2 + 5) / 2, (8 + 11) / 2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[2]), [(3 + 4) / 2, (9 + 10) / 2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[3]), [0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(counts), [2, 2, 2, 0])


def test_segment_mean_pool_ignores_unassigned():
    seg = jnp.asarray([[0, -1], [-1, 1]], dtype=jnp.int32)
    feat = jnp.asarray([[[1.0, 2.0], [3.0, 4.0]]])  # (1, 2, 2)
    out, counts = segment_ops.segment_mean_pool(feat, seg, num_segments=2)
    np.testing.assert_allclose(np.asarray(out[:, 0]), [1.0, 4.0])
    np.testing.assert_allclose(np.asarray(counts), [1, 1])


def test_segment_mean_pool_upsampled_matches_dense_pooling():
    """Pooling patch features with adjoint-downsampled masks must equal
    pooling the materialized bilinear-upsampled map (linearity)."""
    from wild_visual_navigation_tpu.ops.resize import interpolate_bilinear_mxu

    rng = np.random.RandomState(0)
    D, Hp, Wp, H, W, S = 7, 5, 6, 40, 48, 9
    feat = jnp.asarray(rng.randn(D, Hp, Wp).astype(np.float32))
    seg = jnp.asarray(rng.randint(-1, S, size=(H, W)).astype(np.int32))
    dense = interpolate_bilinear_mxu(feat[None], H, W)[0]
    ref, ref_counts = segment_ops.segment_mean_pool(dense, seg, num_segments=S)
    out, counts = segment_ops.segment_mean_pool_upsampled(feat, seg, S, H, W)
    np.testing.assert_allclose(np.asarray(counts), np.asarray(ref_counts))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_segment_masked_mean():
    seg = jnp.asarray([[0, 0], [1, 1]], dtype=jnp.int32)
    values = jnp.asarray([[0.5, 0.7], [0.9, 0.1]])
    valid = jnp.asarray([[True, False], [False, False]])
    mean, seg_valid = segment_ops.segment_masked_mean(values, valid, seg, num_segments=3)
    np.testing.assert_allclose(np.asarray(mean), [0.5, 0.0, 0.0], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(seg_valid), [True, False, False])


def test_segment_centers():
    seg = jnp.zeros((4, 6), dtype=jnp.int32)
    seg = seg.at[2:, 3:].set(1)
    centers, valid = segment_ops.segment_centers(seg, num_segments=2)
    # Segment 1 occupies x in {3,4,5}, y in {2,3} -> center (4.0, 2.5) in (x, y)
    np.testing.assert_allclose(np.asarray(centers[1]), [4.0, 2.5], atol=1e-5)
    assert bool(valid[0]) and bool(valid[1])


def test_adjacency_list():
    seg = jnp.asarray([[0, 0, 1], [2, 2, 1]], dtype=jnp.int32)
    edges, valid = segment_ops.adjacency_list(seg, num_segments=3, max_edges=16)
    e = np.asarray(edges).T[np.asarray(valid)]
    pairs = {frozenset(p) for p in e.tolist()}
    assert frozenset((0, 1)) in pairs
    assert frozenset((0, 2)) in pairs
    assert frozenset((1, 2)) in pairs
    assert frozenset((0, 0)) not in pairs


def test_segment_grid():
    seg = segment_ops.segment_grid(64, 64, cell_size=32)
    assert int(seg[0, 0]) == 0 and int(seg[0, 33]) == 1
    assert int(seg[33, 0]) == 2 and int(seg[33, 33]) == 3
    assert int(jnp.max(seg)) == 3


def test_segment_random():
    seg = segment_ops.segment_random(jax.random.PRNGKey(0), 16, 16, n_random_pixels=10)
    vals = np.asarray(seg).reshape(-1)
    assigned = vals[vals >= 0]
    assert len(assigned) == 10
    assert sorted(assigned.tolist()) == list(range(10))


def test_pixelwise_edges():
    edges = segment_ops.pixelwise_edges(2, 2)
    pairs = {tuple(p) for p in np.asarray(edges).T.tolist()}
    assert (0, 1) in pairs and (2, 3) in pairs and (0, 2) in pairs and (1, 3) in pairs


def test_adjacency_list_all_boundary_checkerboard():
    """When EVERY 4-neighbor pair is a boundary (checkerboard), no -1
    key exists in the data — the dedup must still keep every real edge
    (a fill-at-the-end jnp.unique would have dropped the smallest)."""
    seg = (jnp.indices((4, 4)).sum(0) % 2).astype(jnp.int32)  # 2-color checkerboard
    edges, valid = segment_ops.adjacency_list(seg, 2, max_edges=8)
    got = {tuple(e) for e in np.asarray(edges).T[np.asarray(valid)]}
    assert got == {(0, 1), (1, 0)}  # both directions, nothing lost


def test_adjacency_list_rejects_pixelwise_scale():
    """The int32 pair hash caps at ~46k segments; beyond that it must
    refuse loudly instead of silently wrapping keys negative."""
    seg = jnp.zeros((4, 4), jnp.int32)
    with pytest.raises(ValueError, match="46339"):
        segment_ops.adjacency_list(seg, 50176, max_edges=8)

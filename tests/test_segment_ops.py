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


@pytest.mark.parametrize("hw,phw", [((448, 448), (56, 56)), ((100, 90), (7, 13)), ((56, 56), (56, 56))])
def test_upsampled_adjacency_and_centers_matches_fullres(hw, phw):
    """Patch-res adjacency + block-weighted centroids must equal
    adjacency_list + segment_centers run on the nearest-upsampled map,
    for divisible and non-divisible target sizes alike."""
    H, W = hw
    hp, wp = phw
    S = 20
    seg_p = jax.random.randint(jax.random.PRNGKey(0), (hp, wp), 0, S).astype(jnp.int32)

    iy = (jnp.arange(H) * hp) // H
    ix = (jnp.arange(W) * wp) // W
    seg = seg_p[iy, :][:, ix]

    e_ref, ev_ref = segment_ops.adjacency_list(seg, S, max_edges=1024)
    c_ref, cv_ref = segment_ops.segment_centers(seg, S)

    e, ev, c, cv = segment_ops.upsampled_adjacency_and_centers(
        seg_p, S, H, W, max_edges=1024
    )
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(ev_ref))
    np.testing.assert_array_equal(np.asarray(e), np.asarray(e_ref))
    np.testing.assert_array_equal(np.asarray(cv), np.asarray(cv_ref))
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), rtol=1e-5, atol=1e-3)


def test_upsampled_adjacency_and_centers_rejects_downsample():
    seg_p = jnp.zeros((8, 8), jnp.int32)
    with pytest.raises(ValueError, match="out >= patch grid"):
        segment_ops.upsampled_adjacency_and_centers(seg_p, 4, 4, 4)


def _np_adjacency_bruteforce(seg, S, max_edges):
    """Independent reference for adjacency_list: python-loop boundary
    scan + set dedup + the op's sorted/padded output layout."""
    seg = np.asarray(seg)
    div = S + 1
    H, W = seg.shape
    keys = set()
    for y in range(H):
        for x in range(W):
            for dy, dx in ((0, 1), (1, 0)):
                if y + dy < H and x + dx < W:
                    a, b = int(seg[y, x]), int(seg[y + dy, x + dx])
                    if a != b and a >= 0 and b >= 0:
                        keys.add(a + b * div)
                        keys.add(b + a * div)
    # valid-front / keep-smallest / pad-back — the op's layout contract
    ks = sorted(keys)[:max_edges]
    uniq = np.concatenate([np.asarray(ks, np.int64), np.full(max_edges - len(ks), -1, np.int64)])
    valid = uniq >= 0
    le = np.where(valid, uniq % div, 0)
    ri = np.where(valid, uniq // div, 0)
    return np.stack([le, ri]).astype(np.int32), valid


@pytest.mark.parametrize("seed,S,max_edges", [(0, 20, 1024), (1, 7, 8), (2, 150, 4096)])
def test_adjacency_list_matrix_path_matches_bruteforce(seed, S, max_edges):
    """The S<=256 matrix fast path must reproduce the brute-force edge
    set, layout, and truncation (keep-SMALLEST pair keys: sorted
    ascending, truncated at the front — the layout contract both
    implementations share) exactly — including a max_edges smaller
    than the true edge count (seed 1)."""
    seg = jax.random.randint(jax.random.PRNGKey(seed), (32, 48), -1, S).astype(jnp.int32)
    e, v = segment_ops.adjacency_list(seg, S, max_edges=max_edges)
    e_ref, v_ref = _np_adjacency_bruteforce(seg, S, max_edges)
    np.testing.assert_array_equal(np.asarray(v), v_ref)
    np.testing.assert_array_equal(np.asarray(e), e_ref)


def test_grid_constants_match_generic_ops():
    """grid_constants must equal adjacency_list + segment_centers run
    on the segment_grid map, for a non-divisible (ragged) grid too."""
    for H, W, cs in ((448, 448, 32), (100, 90, 16), (644, 644, 64)):
        ncells = (-(-H // cs)) * (-(-W // cs))
        seg = segment_ops.segment_grid(H, W, cs)
        e_ref, v_ref = segment_ops.adjacency_list(seg, ncells, max_edges=2048)
        c_ref, cv_ref = segment_ops.segment_centers(seg, ncells)
        e, v, c, cv = segment_ops.grid_constants(H, W, cs, ncells, max_edges=2048)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
        np.testing.assert_array_equal(np.asarray(e), np.asarray(e_ref))
        np.testing.assert_array_equal(np.asarray(cv), np.asarray(cv_ref))
        np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), rtol=1e-6, atol=1e-3)


def test_grid_constants_rejects_undersized_num_segments():
    with pytest.raises(ValueError, match="cells"):
        segment_ops.grid_constants(448, 448, 32, 100)


def test_slic_batch_fused_matches_xla():
    """The fused Pallas SLIC (interpret mode on CPU) must (a) produce
    IDENTICAL assignments for a single step from the same centers (the
    kernel replicates the distance formula and argmin tie rule), and
    (b) agree with the XLA path on >= 99% of pixels after full
    iterations (center means accumulate in a different fp32 order —
    per-block partials — so window-boundary pixels can flip)."""
    from wild_visual_navigation_tpu.ops.slic import slic, slic_batch

    imgs = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 64, 96))
    ref = jax.vmap(lambda x: slic(x, num_components=12, iterations=4))(imgs)
    got = slic_batch(imgs, num_components=12, iterations=4, impl="pallas-interpret")
    ref, got = np.asarray(ref), np.asarray(got)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    assert got.min() >= 0 and got.max() < 12
    agree = float(np.mean(ref == got))
    assert agree >= 0.99, agree


def test_slic_fused_single_step_identical():
    """One assignment step from identical centers is bit-identical
    between the kernel and the XLA path (same distances, same
    first-index ties, same window/orphan rules)."""
    import jax.numpy as jnp

    from wild_visual_navigation_tpu.ops import slic as slic_mod
    from wild_visual_navigation_tpu.ops.slic_fused import _P, _round_up, _slic_step

    H, W, K = 64, 96, 12
    img = jax.random.uniform(jax.random.PRNGKey(1), (3, H, W))
    S = (H * W / K) ** 0.5
    ws = 10.0 / S
    win2 = float((2.0 * S) ** 2)

    lab = slic_mod.rgb_to_lab(img)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    feats = jnp.stack([lab[0].ravel(), lab[1].ravel(), lab[2].ravel(),
                       (ys * ws).ravel(), (xs * ws).ravel()], -1)
    init_yx = slic_mod._grid_centers(K, H, W)
    idx = (init_yx[:, 0].astype(jnp.int32) * W
           + init_yx[:, 1].astype(jnp.int32)).clip(0, H * W - 1)
    centers = feats[idx]

    # XLA assign, replicated from slic.py
    p2 = jnp.sum(feats * feats, -1, keepdims=True)
    yx = jnp.stack([ys.ravel(), xs.ravel()], -1)
    yx2 = jnp.sum(yx * yx, -1, keepdims=True)
    c2 = jnp.sum(centers * centers, -1)[None, :]
    dots = jnp.dot(feats, centers.T, preferred_element_type=jnp.float32)
    d2 = p2 - 2.0 * dots + c2
    cyx = centers[:, 3:] / ws
    cyx2 = jnp.sum(cyx * cyx, -1)[None, :]
    sdots = jnp.dot(yx, cyx.T, preferred_element_type=jnp.float32)
    d2s = yx2 - 2.0 * sdots + cyx2
    masked = jnp.where(d2s <= win2, d2, 1e30)
    best = jnp.argmin(masked, -1)
    orphan = jnp.min(d2s, -1) > win2
    ref_ids = np.asarray(jnp.where(orphan, jnp.argmin(d2s, -1), best))

    HW = H * W
    HWpad = _round_up(HW, _P)
    Kp = _round_up(K, 8)
    feats_t = jnp.pad(feats.T[None], ((0, 0), (0, 3), (0, HWpad - HW)))
    valid = ((jax.lax.iota(jnp.int32, HWpad) < HW)
             .astype(jnp.float32).reshape(1, 1, HWpad))
    cpad = jnp.pad(centers[None], ((0, 0), (0, Kp - K), (0, 3)))
    acc, ids = _slic_step(feats_t, valid, cpad, K=K, win2=win2,
                          inv_ws2=float(1.0 / ws ** 2), interpret=True)
    got_ids = np.asarray(ids).reshape(HWpad)[:HW]
    np.testing.assert_array_equal(got_ids, ref_ids)
    # counts from the accumulator equal the assignment histogram
    np.testing.assert_allclose(
        np.asarray(acc)[0, :K, 5], np.bincount(ref_ids, minlength=K), atol=0)


@pytest.mark.parametrize("seed,S,max_edges", [(0, 20, 1024), (1, 7, 8), (3, 130, 64)])
def test_adjacency_list_matrix_equals_hash_path(seed, S, max_edges):
    """The S<=256 matrix path and the generic hash path must return
    bit-identical (edges, edge_valid) — including the positional
    layout (valid first, ascending keys) and keep-smallest truncation."""
    seg = jax.random.randint(jax.random.PRNGKey(seed), (32, 48), -1, S).astype(jnp.int32)
    em, vm = segment_ops.adjacency_list(seg, S, max_edges=max_edges, impl="matrix")
    eh, vh = segment_ops.adjacency_list(seg, S, max_edges=max_edges, impl="hash")
    np.testing.assert_array_equal(np.asarray(vm), np.asarray(vh))
    np.testing.assert_array_equal(np.asarray(em), np.asarray(eh))

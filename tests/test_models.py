"""Model-head tests: shapes, sigmoid ranges, registry mapping, RNVP
invertibility (the reference has no unit tests for these; we add
structural + numerical invariants)."""

import jax
import jax.numpy as jnp
import numpy as np

from wild_visual_navigation_tpu.models import (
    DoubleMLP,
    LinearRnvp,
    SimpleGCN,
    SimpleMLP,
    get_model,
)
from wild_visual_navigation_tpu.models.registry import camel_to_snake


def test_simple_mlp_shapes_and_sigmoid():
    m = SimpleMLP(input_size=90, hidden_sizes=(256, 32, 1), reconstruction=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (17, 90))
    params = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(params, x)
    assert out.shape == (17, 1 + 90)
    trav = np.asarray(out[:, 0])
    assert np.all(trav >= 0) and np.all(trav <= 1)
    # reconstruction head is unconstrained
    assert np.asarray(out[:, 1:]).std() > 0


def test_simple_mlp_no_reconstruction():
    m = SimpleMLP(input_size=8, hidden_sizes=(16, 1), reconstruction=False)
    x = jnp.ones((3, 8))
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (3, 1)


def test_double_mlp():
    m = DoubleMLP(input_size=384, hidden_sizes=(64, 32, 1))
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 384))
    params = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(params, x)
    assert out.shape == (5, 1 + 384)
    assert np.all(np.asarray(out[:, 0]) <= 1)


def test_registry():
    assert camel_to_snake("SimpleMLP") == "simple_mlp"
    assert camel_to_snake("LinearRnvp") == "linear_rnvp"
    assert camel_to_snake("DoubleMLP") == "double_mlp"
    cfg = {
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": 384, "hidden_sizes": [256, 32, 1], "reconstruction": True},
    }
    m = get_model(cfg)
    assert isinstance(m, SimpleMLP)
    assert m.input_size == 384 and m.hidden_sizes == (256, 32, 1)


def test_gcn_forward():
    m = SimpleGCN(input_size=16, hidden_sizes=(32, 1), reconstruction=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (10, 16))
    edges = jnp.asarray([[0, 1, 2], [1, 2, 3]], dtype=jnp.int32)
    edge_valid = jnp.asarray([True, True, False])
    params = m.init(jax.random.PRNGKey(1), x, edges, edge_valid)
    out = m.apply(params, x, edges, edge_valid)
    assert out.shape == (10, 1 + 16)
    # invalid edge must not change output
    edges2 = edges.at[1, 2].set(9)
    out2 = m.apply(params, x, edges2, edge_valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_rnvp_forward_shapes():
    m = LinearRnvp(input_size=32, coupling_topology=(20,), flow_n=3, use_permutation=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (7, 32))
    params = m.init(jax.random.PRNGKey(1), x)
    res = m.apply(params, x)
    assert res["z"].shape == (7, 32)
    assert res["log_det"].shape == (7,)
    assert res["logprob"].shape == (7, 32)


def test_rnvp_invertible():
    m = LinearRnvp(input_size=16, coupling_topology=(24,), flow_n=4, use_permutation=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 16))
    params = m.init(jax.random.PRNGKey(1), x)
    res = m.apply(params, x)
    x_rec, log_det_b = m.apply(params, res["z"], method=m._flow_backward)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_rec), atol=1e-4)
    # backward log-det is the negative of forward
    np.testing.assert_allclose(np.asarray(res["log_det"]), -np.asarray(log_det_b), atol=1e-4)


def test_rnvp_mask_flip_without_permutation():
    m = LinearRnvp(input_size=8, coupling_topology=(8,), flow_n=2, use_permutation=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 8))
    params = m.init(jax.random.PRNGKey(1), x)
    res = m.apply(params, x)
    x_rec, _ = m.apply(params, res["z"], method=m._flow_backward)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_rec), atol=1e-4)


def test_vit_perf_profile_tolerance():
    """The TPU perf profile (attention_impl=xla_bf16 + bf16 LayerNorm
    IO) must stay at the bf16 quantization floor relative to the
    standard bf16 path — it is a bandwidth optimization, not a model
    change (bench.py runs this profile)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wild_visual_navigation_tpu.models.vit import make_vit

    H = 56
    ref = make_vit("dinov2", "vit_small", 14, attention_impl="xla", dtype=jnp.float32)
    perf = make_vit("dinov2", "vit_small", 14, attention_impl="xla_bf16",
                    dtype=jnp.bfloat16, ln_dtype=jnp.bfloat16)
    params = ref.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, H, H)))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, H, H))
    a = np.asarray(ref.apply(params, x)["patch_tokens"])
    b = np.asarray(perf.apply(params, x)["patch_tokens"])
    scale = np.abs(a).max()
    rel = np.abs(a - b).max() / (scale + 1e-9)
    # bf16 has ~3 decimal digits; 12 accumulated blocks -> a few percent
    assert rel < 0.08, rel
    # and the two fields are strongly correlated
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.999, corr


def test_fold_imagenet_normalize_exact():
    """fold_imagenet_normalize(params) on RAW images must equal
    imagenet_normalize + original params (it is algebra on the linear
    patch embedding, not an approximation)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wild_visual_navigation_tpu.models.vit import fold_imagenet_normalize, make_vit
    from wild_visual_navigation_tpu.ops.resize import imagenet_normalize

    vit = make_vit("dinov2", "vit_small", 14, attention_impl="xla", dtype=jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 56, 56)))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 56, 56))
    a = np.asarray(vit.apply(params, imagenet_normalize(x))["patch_tokens"])
    b = np.asarray(vit.apply(fold_imagenet_normalize(params), x)["patch_tokens"])
    np.testing.assert_allclose(a, b, atol=2e-4)
    # original params untouched
    c = np.asarray(vit.apply(params, imagenet_normalize(x))["patch_tokens"])
    np.testing.assert_allclose(a, c, atol=0)


def test_interpolate_bilinear_mxu_matches_gather():
    """The MXU (matmul) bilinear reformulation used by the pixelwise
    scoring path must equal the gather-based reference implementation
    (same two-tap weights; fp summation order only)."""
    import numpy as np

    from wild_visual_navigation_tpu.ops.resize import (
        interpolate_bilinear,
        interpolate_bilinear_mxu,
    )

    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 32, 46).astype(np.float32))
    for shape in [(448, 448), (17, 9), (64, 115)]:
        a = interpolate_bilinear(x, *shape)
        b = interpolate_bilinear_mxu(x, *shape)
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4, shape


def test_int8_backbone_tolerance():
    """Opt-in int8 (W8A8 dynamic) backbone vs fp32 features (VERDICT
    r3 #5). Layerscale is set to 1.0 first — at the 1e-5 init the
    blocks are near-identity and any quant error vanishes; trained
    DINOv2 gammas are O(0.1-1)."""
    from wild_visual_navigation_tpu.models.vit import make_vit

    H = 224
    vit32 = make_vit("dinov2", "vit_small", 14, attention_impl="xla", dtype=jnp.float32)
    vit8 = make_vit("dinov2", "vit_small", 14, attention_impl="xla", dtype=jnp.float32, quant="int8")
    p = vit32.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, H, H)))
    p = jax.tree_util.tree_map_with_path(
        lambda path, l: jnp.ones_like(l)
        if any("ls" in str(getattr(k, "key", "")) for k in path) else l, p)
    img = jax.random.uniform(jax.random.PRNGKey(3), (2, 3, H, H))
    f32 = vit32.apply(p, img)["patch_tokens"]
    f8 = vit8.apply(p, img)["patch_tokens"]
    rel = float(jnp.mean(jnp.abs(f8 - f32)) / jnp.std(f32))
    cos = jnp.sum(f8 * f32, -1) / (jnp.linalg.norm(f8, axis=-1) * jnp.linalg.norm(f32, axis=-1))
    # measured: rel ~0.015, min cos ~0.9998 — pinned with headroom
    assert rel < 0.05, f"int8 feature error too large: {rel:.4f}"
    assert float(cos.min()) > 0.995, f"int8 cosine similarity regressed: {float(cos.min()):.5f}"
    # param pytree is UNCHANGED (checkpoints load as-is)
    p8 = vit8.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, H, H)))
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p8)


def test_pixelwise_score_optimized_matches_reference_order():
    """ops/pixelwise.py: the restructured per-pixel scorer (Dense_0
    before upsample by linearity, bf16 rows, fused MSE) must match the
    literal reference order to the bf16 floor — and in fp32-dominant
    conditions, tightly."""
    from wild_visual_navigation_tpu.models import get_model
    from wild_visual_navigation_tpu.ops.pixelwise import pixelwise_score
    from wild_visual_navigation_tpu.utils.confidence_generator import (
        ConfidenceConfig,
        confidence_init,
    )

    D, Hp, Wp, out = 32, 8, 8, 56
    mlp = get_model({
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": D, "hidden_sizes": [64, 16, 1], "reconstruction": True},
    })
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((1, D)))
    feat = jax.random.normal(jax.random.PRNGKey(1), (2, D, Hp, Wp))
    cfg, st = ConfidenceConfig(), confidence_init()
    t0, c0 = pixelwise_score(params, feat, out, out, cfg, st, optimized=False, mlp=mlp)
    t1, c1 = pixelwise_score(params, feat, out, out, cfg, st, optimized=True)
    assert float(jnp.max(jnp.abs(t0 - t1))) < 0.01  # bf16 rows floor
    assert float(jnp.max(jnp.abs(c0 - c1))) < 0.02
    # ragged/rectangular output (out_h not a multiple of the fused
    # kernel's 8-row chunk, out_w off the 128-lane grid): the Pallas
    # path pads with clamped duplicate rows and trims — must still
    # match the literal reference order, and keep the right shape
    oh, ow = 23, 37
    t2, c2 = pixelwise_score(params, feat, oh, ow, cfg, st, optimized=False, mlp=mlp)
    t3, c3 = pixelwise_score(params, feat, oh, ow, cfg, st, optimized=True, method="fused")
    assert t3.shape == (2, oh, ow) and c3.shape == (2, oh, ow)
    assert float(jnp.max(jnp.abs(t2 - t3))) < 0.01
    assert float(jnp.max(jnp.abs(c2 - c3))) < 0.02


def test_pixelwise_map_rows_chunked_matches_dense_order():
    """ops/pixelwise.py::pixelwise_map_rows_chunked: scoring the
    upsampled feature map in row bands (no (D, H, W) tensor in HBM)
    must equal scoring the materialized dense map row-by-row — for an
    arbitrary per-row fn and for the LinearRnvp anomaly head — incl. a
    ragged out_h that pads the last band."""
    from wild_visual_navigation_tpu.models import get_model
    from wild_visual_navigation_tpu.ops.pixelwise import pixelwise_map_rows_chunked
    from wild_visual_navigation_tpu.ops.resize import interpolate_bilinear_mxu

    D, Hp, Wp = 24, 6, 7
    feat = jax.random.normal(jax.random.PRNGKey(2), (1, D, Hp, Wp))

    for oh, ow in [(40, 48), (23, 37)]:  # 23 % target_rows != 0 -> padded band
        dense = interpolate_bilinear_mxu(feat, oh, ow)[0]
        rows_ref = dense.reshape(D, -1).T

        def score(rows):
            return {"a": rows.sum(-1), "b": jnp.tanh(rows[:, 0])}

        got = pixelwise_map_rows_chunked(score, feat, oh, ow, target_rows=8)
        want = jax.tree_util.tree_map(lambda t: t.reshape(oh, ow), score(rows_ref))
        for k in want:
            assert got[k].shape == (oh, ow)
            assert float(jnp.max(jnp.abs(got[k] - want[k]))) < 1e-5, k

    # the production consumer: LinearRnvp log-likelihood per pixel
    rnvp = get_model({"name": "LinearRnvp", "linear_rnvp_cfg": {"input_size": D}})
    rp = rnvp.init(jax.random.PRNGKey(3), jnp.zeros((1, D)))

    def rnvp_nll(rows):
        out = rnvp.apply(rp, rows)
        return jnp.sum(out["logprob"], axis=-1) + out["log_det"]

    oh = ow = 30
    dense = interpolate_bilinear_mxu(feat, oh, ow)[0]
    want = rnvp_nll(dense.reshape(D, -1).T).reshape(oh, ow)
    got = pixelwise_map_rows_chunked(rnvp_nll, feat, oh, ow, target_rows=8)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-4


def test_supports_optimized_rejects_depth1_head():
    """A single-Dense SimpleMLP would alias layers[0] and layers[-1] in
    the Dense_0-commutes restructuring — supports_optimized must reject
    it so the fused tail falls back to the literal order."""
    from wild_visual_navigation_tpu.models import get_model
    from wild_visual_navigation_tpu.ops.pixelwise import supports_optimized

    shallow = get_model({
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": 8, "hidden_sizes": [1], "reconstruction": True},
    })
    assert not supports_optimized(shallow)
    deep = get_model({
        "name": "SimpleMLP",
        "simple_mlp_cfg": {"input_size": 8, "hidden_sizes": [16, 1], "reconstruction": True},
    })
    assert supports_optimized(deep)


def test_int8_static_backbone_tolerance():
    """quant="int8_static" (VERDICT r4 #5): calibrated per-tensor
    activation scales must stay within the same tolerance band as the
    dynamic scheme on in-calibration data — and the calibration pass
    itself must leave params untouched (checkpoints load as-is)."""
    from wild_visual_navigation_tpu.models.vit import calibrate_int8_static, make_vit

    H = 224
    vit32 = make_vit("dinov2", "vit_small", 14, attention_impl="xla", dtype=jnp.float32)
    vit_st = make_vit("dinov2", "vit_small", 14, attention_impl="xla", dtype=jnp.float32,
                      quant="int8_static")
    p = vit32.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, H, H)))
    p = jax.tree_util.tree_map_with_path(
        lambda path, l: jnp.ones_like(l)
        if any("ls" in str(getattr(k, "key", "")) for k in path) else l, p)
    v = vit_st.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, H, H)))
    assert jax.tree_util.tree_structure(v["params"]) == jax.tree_util.tree_structure(p["params"])
    v = {"params": p["params"], "quant_cal": v["quant_cal"]}
    cal = [jax.random.uniform(jax.random.PRNGKey(10 + i), (2, 3, H, H)) for i in range(2)]
    v = calibrate_int8_static(vit_st, v, cal)
    # calibration recorded nonzero abs-max on every StaticQuantDense
    amaxes = jax.tree_util.tree_leaves(v["quant_cal"])
    assert len(amaxes) == 12 * 4  # qkv/proj/fc1/fc2 per block
    assert all(float(a) > 0 for a in amaxes)

    img = jax.random.uniform(jax.random.PRNGKey(3), (2, 3, H, H))
    f32 = vit32.apply(p, img)["patch_tokens"]
    f_st = vit_st.apply(v, img)["patch_tokens"]
    rel = float(jnp.mean(jnp.abs(f_st - f32)) / jnp.std(f32))
    cos = jnp.sum(f_st * f32, -1) / (jnp.linalg.norm(f_st, axis=-1) * jnp.linalg.norm(f32, axis=-1))
    assert rel < 0.06, f"int8_static feature error too large: {rel:.4f}"
    assert float(cos.min()) > 0.99, f"int8_static cosine regressed: {float(cos.min()):.5f}"


def test_int8_attention_scores_tolerance():
    """attention_impl="xla_int8" (both attention matmuls on the int8
    MXU path, quant.py::attention_scores_int8) vs fp32 attention."""
    from wild_visual_navigation_tpu.models.quant import attention_scores_int8
    from wild_visual_navigation_tpu.ops.flash_attention import xla_attention

    q = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 257, 64), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 257, 64), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 257, 64), jnp.float32)
    ref = xla_attention(q, k, v, sm_scale=64**-0.5)
    got = attention_scores_int8(q, k, v, sm_scale=64**-0.5)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.05, f"int8 attention error too large: {rel:.4f}"

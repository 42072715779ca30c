"""Confidence-generator and loss tests.

Mirrors the reference's test_confidence_generator.py scenario
(synthetic traversability events + noise) qualitatively, plus exact
checks of the update formulas and the padding-invariance property the
fixed-shape re-design must guarantee.
"""

import jax
import jax.numpy as jnp
import numpy as np

from wild_visual_navigation_tpu.utils import (
    ConfidenceConfig,
    TravBatch,
    TraversabilityLossConfig,
    batch_from_arrays,
    confidence_inference,
    confidence_init,
    confidence_load_state_dict,
    confidence_state_dict,
    confidence_update,
    traversability_loss,
)
from wild_visual_navigation_tpu.utils.kalman_filter import (
    KalmanFilterParams,
    kf_init,
    kf_scan,
    kf_step,
)


def test_latest_measurement_formula():
    cfg = ConfidenceConfig(std_factor=0.5, method="latest_measurement")
    state = confidence_init()
    x = jnp.asarray([1.0, 2.0, 3.0, 100.0])
    pos = jnp.asarray([True, True, True, False])
    state, conf = confidence_update(cfg, state, x, pos)
    assert float(state.mean) == 2.0
    np.testing.assert_allclose(float(state.std), 1.0, atol=1e-6)
    # interval: shifted_mean = 2.5, min = max(1.5, 0) = 1.5, max = 3.5
    np.testing.assert_allclose(np.asarray(conf), [1.0, 0.75, 0.25, 0.0], atol=1e-5)


def test_latest_measurement_empty_positive_keeps_state():
    cfg = ConfidenceConfig(std_factor=0.5, method="latest_measurement")
    state = confidence_init()
    state, _ = confidence_update(cfg, state, jnp.asarray([1.0, 2.0]), jnp.asarray([True, True]))
    m0, s0 = float(state.mean), float(state.std)
    state, conf = confidence_update(cfg, state, jnp.asarray([5.0, 5.0]), jnp.asarray([False, False]))
    assert float(state.mean) == m0 and float(state.std) == s0
    assert np.all(np.isfinite(np.asarray(conf)))


def test_running_mean_accumulates():
    cfg = ConfidenceConfig(std_factor=1.0, method="running_mean")
    state = confidence_init()
    rng = np.random.RandomState(0)
    all_vals = []
    for _ in range(10):
        vals = rng.uniform(1.0, 3.0, size=16).astype(np.float32)
        all_vals.append(vals)
        state, _ = confidence_update(cfg, state, jnp.asarray(vals), jnp.ones(16, dtype=bool))
    flat = np.concatenate(all_vals)
    np.testing.assert_allclose(float(state.mean), flat.mean(), rtol=1e-4)
    np.testing.assert_allclose(float(state.std), flat.std(), rtol=1e-3)  # biased, like reference


def test_kalman_filter_method_smooths():
    cfg = ConfidenceConfig(std_factor=0.7, method="kalman_filter")
    state = confidence_init()
    means = []
    for v in [1.0, 1.0, 1.0, 5.0, 1.0, 1.0]:
        state, conf = confidence_update(cfg, state, jnp.full((8,), v), jnp.ones(8, dtype=bool))
        means.append(float(state.mean))
    # the jump to 5 must be smoothed, not copied
    assert means[3] < 5.0 and means[3] > means[2]
    # samples below the mean get confidence 1.0
    state, conf = confidence_update(cfg, state, jnp.asarray([0.0, 10.0]), jnp.asarray([True, True]))
    assert float(conf[0]) == 1.0 and float(conf[1]) < 0.1


def test_moving_average_window():
    cfg = ConfidenceConfig(std_factor=0.7, method="moving_average")
    state = confidence_init()
    rng = np.random.RandomState(1)
    windows = []
    for i in range(7):
        vals = rng.uniform(0, 1, size=8).astype(np.float32) + i
        windows.append(vals)
        state, conf = confidence_update(cfg, state, jnp.asarray(vals), jnp.ones(8, dtype=bool))
    # state.mean must reflect only the last 5 windows
    recent = np.concatenate(windows[-5:])
    np.testing.assert_allclose(float(state.mean), recent.mean(), rtol=1e-3)
    np.testing.assert_allclose(float(state.std), recent.std(ddof=1), rtol=1e-3)
    # an empty-positive step must be a no-op (skip semantics): it must
    # not write a zero-count slot that evicts a real batch's statistics
    state2, _ = confidence_update(cfg, state, jnp.zeros(8), jnp.zeros(8, dtype=bool))
    np.testing.assert_allclose(float(state2.mean), float(state.mean), rtol=1e-6)
    np.testing.assert_allclose(float(state2.std), float(state.std), rtol=1e-6)
    assert int(state2.window_ptr) == int(state.window_ptr)


def test_confidence_state_roundtrip():
    cfg = ConfidenceConfig(std_factor=0.5, method="latest_measurement")
    state = confidence_init()
    state, _ = confidence_update(cfg, state, jnp.asarray([1.0, 3.0]), jnp.asarray([True, True]))
    d = confidence_state_dict(state)
    restored = confidence_load_state_dict(confidence_init(), d)
    x = jnp.linspace(0, 5, 10)
    np.testing.assert_allclose(
        np.asarray(confidence_inference(cfg, state, x)),
        np.asarray(confidence_inference(cfg, restored, x)),
        atol=1e-6,
    )


def test_confidence_qualitative_anomaly_separation():
    """Reference test_confidence_generator scenario: losses of positive
    (traversed) samples are low; anomalies get low confidence."""
    cfg = ConfidenceConfig(std_factor=0.7, method="latest_measurement")
    state = confidence_init()
    rng = np.random.RandomState(2)
    for _ in range(50):
        pos_losses = rng.normal(0.2, 0.05, size=32).astype(np.float32)
        state, _ = confidence_update(cfg, state, jnp.asarray(pos_losses), jnp.ones(32, dtype=bool))
    x = jnp.asarray([0.2, 1.5])  # in-distribution vs anomaly
    conf = confidence_inference(cfg, state, x)
    assert float(conf[0]) > 0.6
    assert float(conf[1]) < 0.05


# ---------------------------------------------------------------- loss


def _rand_batch(key, B=4, S=8, D=16, frac_labeled=0.5):
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (B, S, D))
    y = jax.random.uniform(ks[1], (B, S))
    y_valid = jax.random.uniform(ks[2], (B, S)) < frac_labeled
    sample_valid = jnp.ones((B, S), dtype=bool)
    return batch_from_arrays(x, y, y_valid, sample_valid)


def test_traversability_loss_matches_reference_formula():
    """Transcribe the reference forward (loss.py:93-160) in numpy on
    dense data and compare."""
    cfg = TraversabilityLossConfig(
        w_trav=0.03, w_reco=0.5, anomaly_balanced=True,
        confidence=ConfidenceConfig(std_factor=0.5, method="latest_measurement"),
    )
    batch = _rand_batch(jax.random.PRNGKey(0))
    N, D = batch.x.shape
    res = jax.random.normal(jax.random.PRNGKey(1), (N, 1 + D)) * 0.1 + 0.5

    loss, aux, _ = traversability_loss(cfg, batch, res, confidence_init())

    xb, yb, yv = np.asarray(batch.x), np.asarray(batch.y), np.asarray(batch.y_valid)
    resn = np.asarray(res)
    loss_reco = ((resn[:, 1:] - xb) ** 2).mean(axis=1)
    pos = loss_reco[yv]
    mean, std = pos.mean(), pos.std(ddof=1)
    shifted = mean + 0.5 * std
    lo, hi = max(shifted - std, 0.0), shifted + std
    conf = 1 - (np.clip(loss_reco, lo, hi) - lo) / (hi - lo)
    loss_trav_raw = (resn[:, 0] - yb) ** 2
    lt = (loss_trav_raw[yv].sum() + (loss_trav_raw * (1 - conf))[~yv].sum()) / N
    lr = loss_reco[yv].mean()
    expected = 0.03 * lt + 0.5 * lr
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    np.testing.assert_allclose(float(aux["loss_reco"]), lr, rtol=1e-5)


def test_loss_padding_invariance():
    """Padded samples must not change the loss — the core guarantee of
    the fixed-shape re-design."""
    cfg = TraversabilityLossConfig(confidence=ConfidenceConfig(std_factor=0.5, method="latest_measurement"))
    batch = _rand_batch(jax.random.PRNGKey(3))
    N, D = batch.x.shape
    res = jax.random.normal(jax.random.PRNGKey(4), (N, 1 + D))
    loss, _, st = traversability_loss(cfg, batch, res, confidence_init())

    # append garbage padding rows
    P = 13
    pad_x = jnp.full((P, D), 777.0)
    batch2 = TravBatch(
        x=jnp.concatenate([batch.x, pad_x]),
        y=jnp.concatenate([batch.y, jnp.full((P,), 0.5)]),
        y_valid=jnp.concatenate([batch.y_valid, jnp.zeros(P, dtype=bool)]),
        sample_valid=jnp.concatenate([batch.sample_valid, jnp.zeros(P, dtype=bool)]),
    )
    res2 = jnp.concatenate([res, jnp.full((P, 1 + D), -42.0)])
    loss2, _, st2 = traversability_loss(cfg, batch2, res2, confidence_init())
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-6)
    np.testing.assert_allclose(float(st.mean), float(st2.mean), rtol=1e-6)


def test_loss_is_differentiable():
    cfg = TraversabilityLossConfig()
    batch = _rand_batch(jax.random.PRNGKey(5))
    N, D = batch.x.shape

    def f(res):
        loss, _, _ = traversability_loss(cfg, batch, res, confidence_init())
        return loss

    g = jax.grad(f)(jnp.zeros((N, 1 + D)) + 0.3)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).sum() > 0


# ---------------------------------------------------------- kalman


def test_kf_converges_to_constant_signal():
    params = KalmanFilterParams.make(1, proc_cov=0.5, meas_cov=2.0)
    state = kf_init(1, cov=0.1)
    meas = jnp.ones((100, 1)) * 3.0
    final, traj = kf_scan(params, state, meas)
    np.testing.assert_allclose(float(final.x[0]), 3.0, atol=0.05)


def test_kf_outlier_rejection_huber():
    p_plain = KalmanFilterParams.make(1, proc_cov=0.5, meas_cov=2.0)
    p_huber = KalmanFilterParams.make(1, proc_cov=0.5, meas_cov=2.0, outlier_rejection="huber", outlier_delta=0.5)
    s1, s2 = kf_init(1), kf_init(1)
    for v in [0.0, 0.0, 0.0, 10.0]:
        s1 = kf_step(p_plain, s1, jnp.asarray([v]))
        s2 = kf_step(p_huber, s2, jnp.asarray([v]))
    # huber must dampen the outlier much more
    assert float(s2.x[0]) < float(s1.x[0]) * 0.5


def test_kf_hard_rejection_blocks_outlier():
    p = KalmanFilterParams.make(1, proc_cov=0.01, meas_cov=1.0, outlier_rejection="hard", outlier_delta=2.0)
    s = kf_init(1)
    for v in [0.1, 0.1, 0.1]:
        s = kf_step(p, s, jnp.asarray([v]))
    x_before = float(s.x[0])
    s = kf_step(p, s, jnp.asarray([50.0]))
    assert abs(float(s.x[0]) - x_before) < 1e-5

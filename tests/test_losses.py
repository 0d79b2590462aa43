"""Loss numerics vs torch-free oracles and the reference's documented values."""
import jax.numpy as jnp
import numpy as np
import pytest

from dskd_tpu.core import losses as L
from dskd_tpu.core.integral import integral, integral_average


def test_weighted_loss_protocol():
    """Mirrors the doctest of the reference's weighted_loss decorator."""
    pred = jnp.array([0.0, 2.0, 3.0])
    target = jnp.array([1.0, 1.0, 1.0])
    weight = jnp.array([1.0, 0.0, 1.0])
    assert float(L.l1_loss(pred, target)) == pytest.approx(1.3333, abs=1e-3)
    assert float(L.l1_loss(pred, target, weight)) == pytest.approx(1.0)
    np.testing.assert_allclose(
        np.asarray(L.l1_loss(pred, target, reduction="none")), [1, 1, 2])
    assert float(L.l1_loss(pred, target, weight,
                           avg_factor=2)) == pytest.approx(1.5, abs=1e-5)


def test_bce_with_logits_stable():
    x = jnp.array([-50.0, 0.0, 50.0])
    t = jnp.array([0.0, 1.0, 1.0])
    out = np.asarray(L.binary_cross_entropy_with_logits(x, t))
    expect = np.array([0.0, np.log(2.0), 0.0])
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_qfl_oracle():
    """QFL vs a literal numpy transcription of the formula."""
    rng = np.random.RandomState(3)
    n, c = 12, 5
    pred = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(0, c + 1, size=n)  # c == background
    score = (rng.rand(n) * (labels < c)).astype(np.float32)

    sig = 1 / (1 + np.exp(-pred))
    bce0 = np.log1p(np.exp(-np.abs(pred))) + np.maximum(pred, 0)
    loss = bce0 * sig ** 2
    for i in range(n):
        if labels[i] < c:
            j = labels[i]
            bce = (np.log1p(np.exp(-np.abs(pred[i, j])))
                   + max(pred[i, j], 0) - pred[i, j] * score[i])
            loss[i, j] = bce * abs(score[i] - sig[i, j]) ** 2
    expect = loss.sum(1)

    got = np.asarray(L.quality_focal_loss(
        jnp.array(pred), (jnp.array(labels), jnp.array(score)),
        reduction="none"))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_dfl_oracle():
    rng = np.random.RandomState(4)
    n, bins = 8, 17
    pred = rng.randn(n, bins).astype(np.float32)
    label = (rng.rand(n) * 0.5).astype(np.float32)  # head quirk: in [0, .5]

    logp = pred - pred.max(1, keepdims=True)
    logp = logp - np.log(np.exp(logp).sum(1, keepdims=True))
    dl = label.astype(int)
    dr = dl + 1
    wl, wr = dr - label, label - dl
    expect = -logp[np.arange(n), dl] * wl - logp[np.arange(n), dr] * wr

    got = np.asarray(L.distribution_focal_loss(
        jnp.array(pred), jnp.array(label), reduction="none"))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_kd_kl_div_oracle():
    rng = np.random.RandomState(5)
    s = rng.randn(6, 10).astype(np.float32)
    t = rng.randn(6, 10).astype(np.float32)
    T = 2.0

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    pt = softmax(t / T)
    logps = np.log(softmax(s / T))
    expect = (pt * (np.log(pt) - logps)).mean(-1) * T * T

    got = np.asarray(L.kd_kl_div_loss(jnp.array(s), jnp.array(t), T=T,
                                      reduction="none"))
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=1e-4)


def test_giou_loss_zero_for_identical():
    b = jnp.array([[1.0, 2.0, 5.0, 6.0]])
    assert float(L.giou_loss(b, b)) == pytest.approx(0.0, abs=1e-5)


def test_integral_average_quirk():
    """Raw-sum normalization (NOT softmax) + bins scaled to [0, 0.5]."""
    reg_max = 16
    x = np.zeros((1, 4 * (reg_max + 1)), np.float32)
    # put all mass on bin reg_max for every distance -> each dist = 0.5
    for d in range(4):
        x[0, d * (reg_max + 1) + reg_max] = 1.0
    wh = np.asarray(integral_average(jnp.array(x), reg_max))
    np.testing.assert_allclose(wh, [[1.0, 1.0]], atol=1e-6)  # 0.5+0.5 each

    # uniform mass -> each dist = mean(space) = 0.25 -> w = h = 0.5
    x = np.ones((1, 4 * (reg_max + 1)), np.float32)
    wh = np.asarray(integral_average(jnp.array(x), reg_max))
    np.testing.assert_allclose(wh, [[0.5, 0.5]], atol=1e-6)


def test_integral_canonical():
    reg_max = 4
    x = np.full((1, 4 * (reg_max + 1)), -1e9, np.float32)
    for d in range(4):
        x[0, d * (reg_max + 1) + 2] = 0.0  # delta at bin 2
    out = np.asarray(integral(jnp.array(x), reg_max))
    np.testing.assert_allclose(out, [[2.0, 2.0, 2.0, 2.0]], atol=1e-4)


def test_build_loss_registry():
    loss = L.build_loss(dict(type="L1Loss", loss_weight=5.0))
    assert float(loss(jnp.array([2.0]), jnp.array([0.0]))) == pytest.approx(10.0)

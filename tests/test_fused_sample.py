"""Fused MSDA sampling kernel vs a numpy reference (interpret on CPU),
forward + both gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _with_interpret(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)


def _fixture(seed=0, B=2, S=200, D=32, Q=256, P=4, W=14):
    rng = np.random.RandomState(seed)
    table = rng.randn(B, S, D).astype(np.float32)
    # c00 such that all four corners c00+{0,1,W,W+1} stay in range OR get
    # zero weight (the caller contract)
    idx = rng.randint(0, S - W - 2, (B, Q, P)).astype(np.int32)
    w = rng.rand(B, Q, P, 4).astype(np.float32)
    # exercise the zero-weight OOB contract on a slice: point idx at the
    # end of the table with weights zeroed
    idx[:, 0, 0] = S - 1
    w[:, 0, 0, :] = 0.0
    return table, idx, w, W


def _ref(table, idx, w, W):
    B, S, D = table.shape
    Q, P = idx.shape[1:3]
    out = np.zeros((B, Q, D), np.float32)
    for b in range(B):
        for q in range(Q):
            for p in range(P):
                for c, off in enumerate((0, 1, W, W + 1)):
                    s = idx[b, q, p] + off
                    if 0 <= s < S and w[b, q, p, c] != 0:
                        out[b, q] += w[b, q, p, c] * table[b, s]
    return out


def test_fused_sample_forward(monkeypatch):
    _with_interpret(monkeypatch)
    from dskd_tpu.ops.fused_sample import fused_msda_sample

    table, idx, w, W = _fixture()
    out = fused_msda_sample(jnp.asarray(table), jnp.asarray(idx),
                            jnp.asarray(w), W, tile_q=128)
    np.testing.assert_allclose(np.asarray(out), _ref(table, idx, w, W),
                               rtol=1e-4, atol=1e-4)


def test_fused_sample_grads(monkeypatch):
    _with_interpret(monkeypatch)
    from dskd_tpu.ops.fused_sample import fused_msda_sample

    table, idx, w, W = _fixture(seed=1, B=1, S=96, Q=128, P=2)
    cot = np.random.RandomState(9).randn(1, 128, 32).astype(np.float32)

    def f(t, wt):
        out = fused_msda_sample(t, jnp.asarray(idx), wt, W, tile_q=128)
        return (out * jnp.asarray(cot)).sum()

    gt, gw = jax.grad(f, argnums=(0, 1))(jnp.asarray(table),
                                         jnp.asarray(w))

    # dense reference gradients
    B, S, D = table.shape
    Q, P = idx.shape[1:3]
    ref_gt = np.zeros_like(table)
    ref_gw = np.zeros_like(w)
    for b in range(B):
        for q in range(Q):
            for p in range(P):
                for c, off in enumerate((0, 1, W, W + 1)):
                    s = idx[b, q, p] + off
                    if 0 <= s < S:
                        ref_gt[b, s] += w[b, q, p, c] * cot[b, q]
                        ref_gw[b, q, p, c] = np.dot(cot[b, q], table[b, s])
    np.testing.assert_allclose(np.asarray(gt), ref_gt, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), ref_gw, rtol=1e-4,
                               atol=1e-4)

"""MXU one-hot gather kernel vs jnp.take_along_axis (interpret on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _with_interpret(monkeypatch):
    """Force pallas interpret mode on CPU."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)


def test_mxu_gather_matches_take(monkeypatch):
    _with_interpret(monkeypatch)
    from dskd_tpu.ops.mxu_gather import mxu_gather

    rng = np.random.RandomState(0)
    B, S, D, M = 3, 300, 128, 700
    table = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, S, (B, M)).astype(np.int32))
    out = mxu_gather(table, idx, 256)
    ref = jnp.take_along_axis(table, idx[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_mxu_gather_grad_matches_scatter(monkeypatch):
    _with_interpret(monkeypatch)
    from dskd_tpu.ops.mxu_gather import mxu_gather

    rng = np.random.RandomState(1)
    B, S, D, M = 2, 128, 128, 300
    table = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, S, (B, M)).astype(np.int32))
    w = jnp.asarray(rng.randn(B, M, D).astype(np.float32))

    def f_kernel(t):
        return (mxu_gather(t, idx, 256) * w).sum()

    def f_ref(t):
        return (jnp.take_along_axis(t, idx[..., None], axis=1) * w).sum()

    g1 = jax.grad(f_kernel)(table)
    g2 = jax.grad(f_ref)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


def test_mxu_gather_weighted_matches_reference(monkeypatch):
    _with_interpret(monkeypatch)
    from dskd_tpu.ops.mxu_gather import mxu_gather_weighted

    rng = np.random.RandomState(2)
    B, S, D, Q, P = 2, 150, 32, 300, 4
    table = jnp.asarray(rng.randn(B, S, 4 * D).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, S, (B, Q, P)).astype(np.int32))
    w = jnp.asarray(rng.randn(B, Q, P, 4).astype(np.float32))

    out = mxu_gather_weighted(table, idx, w, 128)
    g = jnp.take_along_axis(table, idx.reshape(B, Q * P)[..., None],
                            axis=1).reshape(B, Q, P, 4 * D)
    ref = (g * jnp.repeat(w, D, axis=-1)).sum(axis=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_mxu_gather_weighted_grads(monkeypatch):
    _with_interpret(monkeypatch)
    from dskd_tpu.ops.mxu_gather import mxu_gather_weighted

    rng = np.random.RandomState(3)
    B, S, D, Q, P = 2, 96, 32, 200, 4
    table = jnp.asarray(rng.randn(B, S, 4 * D).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, S, (B, Q, P)).astype(np.int32))
    w = jnp.asarray(rng.randn(B, Q, P, 4).astype(np.float32))
    co = jnp.asarray(rng.randn(B, Q, 4 * D).astype(np.float32))

    def f_kernel(t, ww):
        return (mxu_gather_weighted(t, idx, ww, 128) * co).sum()

    def f_ref(t, ww):
        g = jnp.take_along_axis(t, idx.reshape(B, Q * P)[..., None],
                                axis=1).reshape(B, Q, P, 4 * D)
        return ((g * jnp.repeat(ww, D, axis=-1)).sum(axis=2) * co).sum()

    gt1, gw1 = jax.grad(f_kernel, argnums=(0, 1))(table, w)
    gt2, gw2 = jax.grad(f_ref, argnums=(0, 1))(table, w)
    np.testing.assert_allclose(np.asarray(gt1), np.asarray(gt2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=1e-4, atol=1e-4)

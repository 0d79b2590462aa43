"""Fused corner-table packing kernel vs ops/msda.py _pack_corners
(interpret on CPU), forward + VJP."""
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


@pytest.mark.parametrize("h,w,tile", [(12, 16, 8), (15, 20, 8), (8, 10, 4),
                                      (6, 8, 16)])
def test_pack_matches_reference(monkeypatch, h, w, tile):
    _with_interpret(monkeypatch)
    from dskd_tpu.ops.msda import _pack_corners
    from dskd_tpu.ops.pack_kernel import pack_corners_fused

    rng = np.random.RandomState(0)
    B, H, D = 2, 8, 32
    v = jnp.asarray(rng.randn(B, h * w, H, D).astype(np.float32))
    out = pack_corners_fused(v, h, w, tile)
    ref = _pack_corners(v, h, w, head_major=False)   # (B, S', H, 4D)
    sp = (h + 2) * (w + 2)
    assert out.shape[1] >= sp
    np.testing.assert_allclose(np.asarray(out[:, :sp]), np.asarray(ref),
                               atol=1e-6)


def test_pack_vjp_matches_reference(monkeypatch):
    _with_interpret(monkeypatch)
    from dskd_tpu.ops.msda import _pack_corners
    from dskd_tpu.ops.pack_kernel import pack_corners_fused

    rng = np.random.RandomState(1)
    B, H, D, h, w, tile = 1, 8, 32, 10, 12, 8
    v = jnp.asarray(rng.randn(B, h * w, H, D).astype(np.float32))
    sp = (h + 2) * (w + 2)
    # random downstream projection so the cotangent exercises every cell
    proj = jnp.asarray(rng.randn(sp, H, 4 * D).astype(np.float32))

    def f_kernel(x):
        return (pack_corners_fused(x, h, w, tile)[:, :sp] * proj).sum()

    def f_ref(x):
        return (_pack_corners(x, h, w, head_major=False) * proj).sum()

    gk = jax.grad(f_kernel)(v)
    gr = jax.grad(f_ref)(v)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=1e-4,
                               rtol=1e-5)


def test_pack_bf16(monkeypatch):
    _with_interpret(monkeypatch)
    from dskd_tpu.ops.msda import _pack_corners
    from dskd_tpu.ops.pack_kernel import pack_corners_fused

    rng = np.random.RandomState(2)
    B, H, D, h, w = 1, 8, 32, 9, 11
    v = jnp.asarray(rng.randn(B, h * w, H, D).astype(np.float32)
                    ).astype(jnp.bfloat16)
    out = pack_corners_fused(v, h, w, 8)
    ref = _pack_corners(v, h, w, head_major=False)
    sp = (h + 2) * (w + 2)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(out[:, :sp].astype(jnp.float32)),
        np.asarray(ref.astype(jnp.float32)))

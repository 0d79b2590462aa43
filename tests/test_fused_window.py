"""Fused windowed MSDA sampling kernel: forward parity with the weighted
gather it replaces, escape zero-masking, and backward (scatter-add +
chunk-product oracles). Pallas interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from dskd_tpu.ops.fused_window import (fused_window_sample,
                                       segment_window_starts)

B, S, D, P = 2, 256, 128, 4
TQ, K = 16, 64
Q = 64


def _setup(seed=0):
    rng = np.random.RandomState(seed)
    table = rng.randn(B, S, D).astype(np.float32)
    n_tiles = Q // TQ
    starts = np.arange(n_tiles, dtype=np.int32) * 32
    idx = np.zeros((B, Q, P), np.int32)
    for t in range(n_tiles):
        idx[:, t * TQ:(t + 1) * TQ] = rng.randint(
            starts[t], starts[t] + K, (B, TQ, P))
    w = rng.rand(B, Q, P, 4).astype(np.float32)
    return (jnp.asarray(table), jnp.asarray(idx), jnp.asarray(w),
            jnp.asarray(starts))


def _oracle(table, idx, w):
    """out[b,q,c*d:(c+1)*d] = sum_p w[b,q,p,c] * table[b, idx[b,q,p], ...]"""
    d = D // 4
    tn, idxn, wn = np.asarray(table), np.asarray(idx), np.asarray(w)
    out = np.zeros((B, Q, D), np.float32)
    for b in range(B):
        g = tn[b][idxn[b].reshape(-1)].reshape(Q, P, D)
        for c in range(4):
            out[b, :, c * d:(c + 1) * d] = (
                g[..., c * d:(c + 1) * d] * wn[b, ..., c:c + 1]).sum(axis=1)
    return out


def test_fused_window_forward_matches_weighted_gather():
    table, idx, w, starts = _setup()
    with pltpu.force_tpu_interpret_mode():
        out = fused_window_sample(table, idx, w, starts, K, tile_q=TQ)
    np.testing.assert_allclose(np.asarray(out), _oracle(table, idx, w),
                               rtol=1e-5, atol=1e-5)


def test_fused_window_masks_escapes():
    table, idx, w, starts = _setup()
    idx = idx.at[0, 3, 1].set(200)   # outside tile 0's window [0, 64)
    with pltpu.force_tpu_interpret_mode():
        out = fused_window_sample(table, idx, w, starts, K, tile_q=TQ)
    want = _oracle(table, jnp.zeros_like(idx).at[:].set(idx), w)
    # escaped point contributes zero: recompute oracle with its w zeroed
    w0 = np.asarray(w).copy()
    w0[0, 3, 1] = 0.0
    want = _oracle(table, idx, jnp.asarray(w0))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


def test_fused_window_backward_oracles():
    table, idx, w, starts = _setup(seed=1)
    g = jnp.asarray(np.random.RandomState(2).randn(B, Q, D)
                    .astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        _, vjp = jax.vjp(
            lambda t, ww: fused_window_sample(t, idx, ww, starts, K,
                                              tile_q=TQ), table, w)
        dtable, dw = vjp(g)

    d = D // 4
    gn, wn, idxn = np.asarray(g), np.asarray(w), np.asarray(idx)
    tn = np.asarray(table)
    want_dt = np.zeros_like(tn)
    want_dw = np.zeros_like(wn)
    for b in range(B):
        for q in range(Q):
            for p in range(P):
                r = idxn[b, q, p]
                for c in range(4):
                    sl = slice(c * d, (c + 1) * d)
                    want_dt[b, r, sl] += wn[b, q, p, c] * gn[b, q, sl]
                    want_dw[b, q, p, c] = (tn[b, r, sl]
                                           * gn[b, q, sl]).sum()
    np.testing.assert_allclose(np.asarray(dtable), want_dt,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), want_dw,
                               rtol=1e-4, atol=1e-4)


def test_segment_window_starts_geometry():
    # level-1 tokens (8x10) sampling a 16x20 level-0 map, packed 18x22
    s_pad = 18 * 22
    starts = segment_window_starts(80, 16, (8, 10), (16, 20),
                                   s_pad, window=128)
    assert len(starts) == 5
    assert all(s % 16 == 0 for s in starts)
    assert all(0 <= s <= s_pad - 128 for s in starts)
    # centers must advance monotonically with the tile's image row
    assert list(starts) == sorted(starts)

"""Windowed MXU gather: numeric parity with a plain gather (in-window),
zero masking (out-of-window), and matmul backward vs scatter-add oracle.
Runs in Pallas interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from dskd_tpu.ops.window_gather import tile_window_starts, window_gather


def _setup(seed=0, B=2, S=256, D=128, M=64, tile_rows=16, window=64):
    rng = np.random.RandomState(seed)
    table = rng.randn(B, S, D).astype(np.float32)
    n_tiles = M // tile_rows
    starts = np.arange(n_tiles, dtype=np.int32) * 32   # overlapping ok
    idx = np.zeros((B, M), np.int32)
    for t in range(n_tiles):
        lo = starts[t]
        idx[:, t * tile_rows:(t + 1) * tile_rows] = rng.randint(
            lo, lo + window, (B, tile_rows))
    return (jnp.asarray(table), jnp.asarray(idx), jnp.asarray(starts),
            tile_rows, window)


def test_window_gather_matches_plain_gather():
    table, idx, starts, tr, K = _setup()
    with pltpu.force_tpu_interpret_mode():
        out = window_gather(table, idx, starts, tr, K)
    want = np.take_along_axis(np.asarray(table),
                              np.asarray(idx)[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)


def test_window_gather_masks_escapes():
    table, idx, starts, tr, K = _setup()
    idx = idx.at[0, 3].set(250)     # far outside tile 0's window [0, 64)
    with pltpu.force_tpu_interpret_mode():
        out = window_gather(table, idx, starts, tr, K)
    assert float(jnp.abs(out[0, 3]).max()) == 0.0
    want = np.take_along_axis(np.asarray(table),
                              np.asarray(idx)[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(out[0, 4:]), want[0, 4:],
                               rtol=1e-6)


def test_window_gather_backward_is_scatter_add():
    table, idx, starts, tr, K = _setup(seed=1)
    g = jnp.asarray(np.random.RandomState(2).randn(*idx.shape, 128)
                    .astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        _, vjp = jax.vjp(
            lambda t: window_gather(t, idx, starts, tr, K), table)
        (dtable,) = vjp(g)

    want = np.zeros_like(np.asarray(table))
    idx_np = np.asarray(idx)
    for b in range(idx.shape[0]):
        for m in range(idx.shape[1]):
            want[b, idx_np[b, m]] += np.asarray(g)[b, m]
    np.testing.assert_allclose(np.asarray(dtable), want, rtol=1e-5,
                               atol=1e-5)


def test_tile_window_starts_cover_tile_rows():
    """Every sample within `margin` image rows of its query must land in
    the window for the mmcv-init offset scale."""
    h = w = 80
    w_pad, s_pad = w + 2, (h + 2) * (w + 2)
    tile_q, window = 128, 1024
    starts = tile_window_starts(h * w, tile_q, w, w_pad, s_pad, window)
    assert len(starts) == h * w // tile_q
    margin_rows = (window // w_pad - (tile_q // w + 1)) // 2
    assert margin_rows >= 4   # covers offsets within +-4 image rows (32px)
    for t, ws in enumerate(starts):
        assert 0 <= ws <= s_pad - window
        # the tile's own base rows are strictly inside the window
        for q in (t * tile_q, (t + 1) * tile_q - 1):
            row = q // w + 1
            base = row * w_pad
            assert ws <= base and base + w_pad <= ws + window, (t, q)

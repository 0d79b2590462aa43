"""windowed_bwd_sample: forward is the plain XLA gather; backward must
match the plain formulation's autodiff VJP exactly (same windows, same
weights). Pallas interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from dskd_tpu.ops.window_bwd import (_plain_sample, windowed_bwd_sample)


def _problem(seed=0, B=2, Q=256, H=2, P=4, S=160, D4=128, tile_q=128,
             window=64):
    rng = np.random.RandomState(seed)
    packedk = jnp.asarray(rng.randn(B, S, H, D4).astype(np.float32))
    n_tiles = Q // tile_q
    starts = np.arange(n_tiles, dtype=np.int32) * 32
    starts = starts - starts % 16
    # indices INSIDE each tile's [start, start+window) window
    flat = np.zeros((B, Q, H, P), np.int32)
    for t in range(n_tiles):
        flat[:, t * tile_q:(t + 1) * tile_q] = rng.randint(
            starts[t], starts[t] + window, (B, tile_q, H, P))
    cw = rng.rand(B, Q, H, P, 4).astype(np.float32)
    return packedk, jnp.asarray(flat), jnp.asarray(cw), \
        jnp.asarray(starts), window, tile_q


def test_forward_matches_plain():
    packedk, flat, cw, starts, window, tile_q = _problem()
    ref = _plain_sample(packedk, flat, cw)
    got = windowed_bwd_sample(packedk, flat, cw, starts, window, tile_q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_backward_matches_autodiff():
    packedk, flat, cw, starts, window, tile_q = _problem()
    g = jnp.asarray(np.random.RandomState(1).randn(
        *_plain_sample(packedk, flat, cw).shape).astype(np.float32))

    def loss_plain(tbl, w):
        return (_plain_sample(tbl, flat, w) * g).sum()

    def loss_win(tbl, w):
        return (windowed_bwd_sample(tbl, flat, w, starts, window,
                                    tile_q) * g).sum()

    dt_ref, dw_ref = jax.grad(loss_plain, argnums=(0, 1))(packedk, cw)
    with pltpu.force_tpu_interpret_mode():
        dt, dw = jax.grad(loss_win, argnums=(0, 1))(packedk, cw)
    np.testing.assert_allclose(np.asarray(dt), np.asarray(dt_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-4, atol=1e-4)


def test_msda_winbwd_end_to_end(monkeypatch):
    """DSKD_WINBWD=1 through ms_deform_attn_core: identical forward AND
    identical (value, locs, weights) grads vs the plain path, with the
    escape case falling back through the cond."""
    from dskd_tpu.ops.msda import ms_deform_attn_core

    monkeypatch.setenv("DSKD_FORCE_MXU", "1")
    monkeypatch.setenv("DSKD_WINBWD", "1")
    monkeypatch.setenv("DSKD_FWIN_MARGIN", "2")
    rng = np.random.RandomState(0)
    B, H, D, P = 1, 2, 64, 2
    shapes = [(32, 32), (16, 16)]
    S = sum(h * w for h, w in shapes)
    Q = S
    value = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    weights = jax.nn.softmax(jnp.asarray(
        rng.randn(B, Q, H, len(shapes), P).astype(np.float32))
        .reshape(B, Q, H, -1), -1).reshape(B, Q, H, len(shapes), P)
    ys, xs = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    own = np.stack([(xs.ravel() + 0.5) / 32, (ys.ravel() + 0.5) / 32], -1)
    own = np.concatenate([own, rng.rand(S - 1024, 2)], 0)
    locs = (own[None, :, None, None, None, :]
            + rng.randn(B, Q, H, 2, P, 2).astype(np.float32) * 0.005)
    locs = jnp.asarray(locs.astype(np.float32))
    g_out = jnp.asarray(rng.randn(B, Q, H * D).astype(np.float32))

    # level-0 table has 34*34 > mxu_gather_max_rows -> pack-kernel branch
    kw = dict(mxu_gather_max_rows=100, raster_queries=True)

    def loss(v, l, w, **k):
        return (ms_deform_attn_core(v, shapes, l, w, **k) * g_out).sum()

    with pltpu.force_tpu_interpret_mode():
        out_win = np.asarray(ms_deform_attn_core(
            value, shapes, locs, weights, **kw))
        gv, gl, gw = jax.grad(loss, argnums=(0, 1, 2))(
            value, locs, weights, **kw)
    monkeypatch.setenv("DSKD_WINBWD", "0")
    with pltpu.force_tpu_interpret_mode():
        out_ref = np.asarray(ms_deform_attn_core(
            value, shapes, locs, weights, **kw))
        gv_r, gl_r, gw_r = jax.grad(loss, argnums=(0, 1, 2))(
            value, locs, weights, **kw)
    np.testing.assert_allclose(out_win, out_ref, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(gl_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-5)

    # an escaping sample must still be exact (cond fallback)
    monkeypatch.setenv("DSKD_WINBWD", "1")
    locs_far = locs.at[0, 5, 0, 0, 0].set(jnp.array([0.99, 0.99]))
    with pltpu.force_tpu_interpret_mode():
        far_win = np.asarray(ms_deform_attn_core(
            value, shapes, locs_far, weights, **kw))
        gv2, = jax.grad(loss, argnums=(0,))(value, locs_far, weights,
                                            **kw)
    monkeypatch.setenv("DSKD_WINBWD", "0")
    with pltpu.force_tpu_interpret_mode():
        far_ref = np.asarray(ms_deform_attn_core(
            value, shapes, locs_far, weights, **kw))
        gv2_r, = jax.grad(loss, argnums=(0,))(value, locs_far, weights,
                                              **kw)
    np.testing.assert_allclose(far_win, far_ref, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(gv2), np.asarray(gv2_r),
                               rtol=1e-4, atol=1e-5)

"""MS-deformable-attention sampling core vs a torch grid_sample oracle.

The oracle transcribes the semantics of the reference's CUDA op (mmcv
MultiScaleDeformableAttention / ms_deform_attn: per level, bilinear
grid_sample with align_corners=False and zero padding, weighted sum over
levels x points). This is the hardest-kernel parity check (SURVEY §2.8).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_msda_oracle(value, spatial_shapes, locs, weights):
    """value: (B, S, H, D); locs: (B, Q, H, L, P, 2); weights same minus 2."""
    B, S, H, D = value.shape
    _, Q = locs.shape[:2]
    L = len(spatial_shapes)
    out = torch.zeros(B, Q, H, D)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, start:start + h * w]            # (B, hw, H, D)
        v = v.permute(0, 2, 3, 1).reshape(B * H, D, h, w)
        g = locs[:, :, :, lvl] * 2 - 1               # (B, Q, H, P, 2)
        g = g.permute(0, 2, 1, 3, 4).reshape(B * H, Q, -1, 2)
        sampled = F.grid_sample(v, g, mode="bilinear",
                                padding_mode="zeros", align_corners=False)
        sampled = sampled.reshape(B, H, D, Q, -1)    # (B, H, D, Q, P)
        wgt = weights[:, :, :, lvl].permute(0, 2, 1, 3)  # (B, H, Q, P)
        out += (sampled * wgt[:, :, None]).sum(-1).permute(0, 3, 1, 2)
        start += h * w
    return out.reshape(B, Q, H * D)


def test_msda_matches_grid_sample():
    import jax.numpy as jnp

    from dskd_tpu.ops.msda import ms_deform_attn_core

    rng = np.random.RandomState(0)
    B, H, D, Q, P = 2, 4, 8, 10, 4
    shapes = [(8, 8), (4, 4), (2, 2)]
    S = sum(h * w for h, w in shapes)
    value = rng.randn(B, S, H, D).astype(np.float32)
    # locations straddling borders to exercise zero-padding
    locs = rng.rand(B, Q, H, len(shapes), P, 2).astype(np.float32) * 1.3 - .15
    w = rng.rand(B, Q, H, len(shapes), P).astype(np.float32)
    w = w / w.sum((-1, -2), keepdims=True)

    got = np.asarray(ms_deform_attn_core(
        jnp.array(value), shapes, jnp.array(locs), jnp.array(w)))
    expect = torch_msda_oracle(torch.from_numpy(value), shapes,
                               torch.from_numpy(locs),
                               torch.from_numpy(w)).numpy()
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_msda_gradients_finite():
    import jax
    import jax.numpy as jnp

    from dskd_tpu.ops.msda import ms_deform_attn_core

    rng = np.random.RandomState(1)
    shapes = [(4, 4), (2, 2)]
    S = sum(h * w for h, w in shapes)
    value = jnp.array(rng.randn(1, S, 2, 4).astype(np.float32))
    locs = jnp.array(rng.rand(1, 3, 2, 2, 2, 2).astype(np.float32))
    w = jnp.array(rng.rand(1, 3, 2, 2, 2).astype(np.float32))

    def f(v, l, w):
        return ms_deform_attn_core(v, shapes, l, w).sum()

    grads = jax.grad(f, argnums=(0, 1, 2))(value, locs, w)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_msda_windowed_path_matches_reference(monkeypatch):
    """The windowed level-0 path (raster encoder queries) must be bit-exact
    with the plain path — both when every sample stays in its window and
    when an escape forces the cond fallback."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from dskd_tpu.ops.msda import ms_deform_attn_core

    monkeypatch.setenv("DSKD_FORCE_MXU", "1")
    monkeypatch.setenv("DSKD_FWIN", "0")   # pin the legacy window branch
    rng = np.random.RandomState(0)
    B, H, D, P = 1, 2, 64, 2
    shapes = [(16, 16), (8, 8)]       # S = 320; level-0 table 18*18=324
    S = sum(h * w for h, w in shapes)
    Q = S                             # encoder: queries are the tokens
    value = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    weights = jax.nn.softmax(jnp.asarray(
        rng.randn(B, Q, H, len(shapes), P).astype(np.float32))
        .reshape(B, Q, H, -1), -1).reshape(B, Q, H, len(shapes), P)

    # locations near each query's own position (in-window)
    ys, xs = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    own = np.stack([(xs.ravel() + 0.5) / 16, (ys.ravel() + 0.5) / 16], -1)
    own = np.concatenate([own, rng.rand(S - 256, 2)], 0)   # level-1 queries
    locs = (own[None, :, None, None, None, :]
            + rng.randn(B, Q, H, 2, P, 2).astype(np.float32) * 0.01)
    locs = jnp.asarray(locs.astype(np.float32))

    kw = dict(mxu_gather_max_rows=100, window_tile_q=32, window_rows=128)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ms_deform_attn_core(
            value, shapes, locs, weights, raster_queries=True, **kw))
    monkeypatch.setenv("DSKD_FORCE_MXU", "0")
    want = np.asarray(ms_deform_attn_core(
        value, shapes, locs, weights, raster_queries=False))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)

    # one sample far away -> escape -> cond falls back, still exact
    monkeypatch.setenv("DSKD_FORCE_MXU", "1")
    locs_far = locs.at[0, 5, 0, 0, 0].set(jnp.array([0.99, 0.99]))
    with pltpu.force_tpu_interpret_mode():
        got_far = np.asarray(ms_deform_attn_core(
            value, shapes, locs_far, weights, raster_queries=True, **kw))
    monkeypatch.setenv("DSKD_FORCE_MXU", "0")
    want_far = np.asarray(ms_deform_attn_core(
        value, shapes, locs_far, weights, raster_queries=False))
    np.testing.assert_allclose(got_far, want_far, rtol=2e-5, atol=2e-6)
    assert np.abs(got_far - got).max() > 0    # the escape actually changed it


def test_msda_fused_path_matches_reference(monkeypatch):
    """Fused one-hot sampling kernel (ops/fused_sample.py) is numerically
    the torch grid_sample semantics too, incl. out-of-bounds corners and
    the Q-padding to tile multiples."""
    import jax.numpy as jnp

    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setenv("DSKD_FORCE_MXU", "1")
    monkeypatch.setenv("DSKD_FUSED_ROWS", "100")

    from dskd_tpu.ops.msda import ms_deform_attn_core

    rng = np.random.RandomState(3)
    B, H, D, Q, P = 2, 2, 8, 10, 4
    shapes = [(8, 8), (4, 4), (2, 2)]
    S = sum(h * w for h, w in shapes)
    value = rng.randn(B, S, H, D).astype(np.float32)
    locs = rng.rand(B, Q, H, len(shapes), P, 2).astype(np.float32) * 1.3 - .15
    w = rng.rand(B, Q, H, len(shapes), P).astype(np.float32)
    w = w / w.sum((-1, -2), keepdims=True)

    got = np.asarray(ms_deform_attn_core(
        jnp.array(value), shapes, jnp.array(locs), jnp.array(w)))
    expect = torch_msda_oracle(torch.from_numpy(value), shapes,
                               torch.from_numpy(locs),
                               torch.from_numpy(w)).numpy()
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def _fwin_setup(seed=0):
    import jax
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    B, H, D, P = 1, 2, 64, 2
    shapes = [(16, 16), (8, 8)]
    S = sum(h * w for h, w in shapes)
    Q = S
    value = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    weights = jax.nn.softmax(jnp.asarray(
        rng.randn(B, Q, H, len(shapes), P).astype(np.float32))
        .reshape(B, Q, H, -1), -1).reshape(B, Q, H, len(shapes), P)
    ys, xs = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    own0 = np.stack([(xs.ravel() + 0.5) / 16, (ys.ravel() + 0.5) / 16], -1)
    ys1, xs1 = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    own1 = np.stack([(xs1.ravel() + 0.5) / 8, (ys1.ravel() + 0.5) / 8], -1)
    own = np.concatenate([own0, own1], 0)
    locs = (own[None, :, None, None, None, :]
            + rng.randn(B, Q, H, 2, P, 2).astype(np.float32) * 0.01)
    return value, shapes, jnp.asarray(locs.astype(np.float32)), weights


def test_msda_fwin_path_matches_reference(monkeypatch):
    """Fused windowed level-0 sampling (ops/fused_window.py via the
    DSKD_FWIN branch) matches the plain path, in-window and on escape."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from dskd_tpu.ops.msda import ms_deform_attn_core

    monkeypatch.setenv("DSKD_FORCE_MXU", "1")
    monkeypatch.setenv("DSKD_FWIN", "1")
    monkeypatch.setenv("DSKD_FWIN_MARGIN", "1")
    value, shapes, locs, weights = _fwin_setup()
    kw = dict(mxu_gather_max_rows=100, fwin_tile_q=32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ms_deform_attn_core(
            value, shapes, locs, weights, raster_queries=True, **kw))
    monkeypatch.setenv("DSKD_FORCE_MXU", "0")
    want = np.asarray(ms_deform_attn_core(
        value, shapes, locs, weights, raster_queries=False))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)

    # escape -> cond fallback, still exact
    monkeypatch.setenv("DSKD_FORCE_MXU", "1")
    locs_far = locs.at[0, 5, 0, 0, 0].set(jnp.array([0.99, 0.99]))
    with pltpu.force_tpu_interpret_mode():
        got_far = np.asarray(ms_deform_attn_core(
            value, shapes, locs_far, weights, raster_queries=True, **kw))
    monkeypatch.setenv("DSKD_FORCE_MXU", "0")
    want_far = np.asarray(ms_deform_attn_core(
        value, shapes, locs_far, weights, raster_queries=False))
    np.testing.assert_allclose(got_far, want_far, rtol=2e-5, atol=2e-6)
    assert np.abs(got_far - got).max() > 0


def test_msda_fwin_gradients_match_plain(monkeypatch):
    """Backward through the fwin branch (custom_vjp matmul scatter) agrees
    with the plain path's autodiff for value, locations, and weights."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from dskd_tpu.ops.msda import ms_deform_attn_core

    value, shapes, locs, weights = _fwin_setup(seed=7)

    def loss(v, l, w, **kw):
        out = ms_deform_attn_core(v, shapes, l, w, **kw)
        return (out * out).sum()

    monkeypatch.setenv("DSKD_FORCE_MXU", "1")
    monkeypatch.setenv("DSKD_FWIN", "1")
    monkeypatch.setenv("DSKD_FWIN_MARGIN", "1")
    with pltpu.force_tpu_interpret_mode():
        gv, gl, gw = jax.grad(loss, argnums=(0, 1, 2))(
            value, locs, weights, raster_queries=True,
            mxu_gather_max_rows=100, fwin_tile_q=32)
    monkeypatch.setenv("DSKD_FORCE_MXU", "0")
    wv, wl, ww = jax.grad(loss, argnums=(0, 1, 2))(
        value, locs, weights, raster_queries=False)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(wl),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(ww),
                               rtol=1e-4, atol=1e-5)


def test_msda_pack_kernel_path_matches_reference(monkeypatch):
    """DSKD_PACK_KERNEL=1 (one-write Pallas corner table + middle-axis
    gather) must be bit-exact with the plain path, forward and VJP."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from dskd_tpu.ops.msda import ms_deform_attn_core

    rng = np.random.RandomState(3)
    B, H, D, P = 2, 8, 32, 4
    shapes = [(12, 16), (6, 8)]
    S = sum(h * w for h, w in shapes)
    Q = 40
    value = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    weights = jax.nn.softmax(jnp.asarray(
        rng.randn(B, Q, H, len(shapes), P).astype(np.float32))
        .reshape(B, Q, H, -1), -1).reshape(B, Q, H, len(shapes), P)
    # include out-of-bounds samples to exercise the zero-corner gates
    locs = jnp.asarray(
        (rng.rand(B, Q, H, len(shapes), P, 2) * 1.3 - 0.15)
        .astype(np.float32))

    def run(pack):
        monkeypatch.setenv("DSKD_FORCE_MXU", "1" if pack else "0")
        monkeypatch.setenv("DSKD_PACK_KERNEL", "1" if pack else "0")

        def f(v):
            # max_rows=10: every level routes to the pack-kernel branch
            o = ms_deform_attn_core(v, shapes, locs, weights,
                                    mxu_gather_max_rows=10)
            return (o * jnp.cos(jnp.arange(o.size, dtype=jnp.float32)
                                .reshape(o.shape))).sum(), o

        if pack:
            with pltpu.force_tpu_interpret_mode():
                (_, o), g = jax.value_and_grad(f, has_aux=True)(value)
        else:
            (_, o), g = jax.value_and_grad(f, has_aux=True)(value)
        return np.asarray(o), np.asarray(g)

    got, ggot = run(True)
    want, gwant = run(False)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(ggot, gwant, rtol=2e-4, atol=2e-5)

"""Swin-T: stage shapes, param count, shift-mask semantics, rel-pos index."""
import numpy as np
import jax
import jax.numpy as jnp

from dskd_tpu.models.swin import (SwinTransformer, _rel_pos_index,
                                  _shift_mask, WINDOW)


def test_rel_pos_index_properties():
    idx = _rel_pos_index(WINDOW)
    n = WINDOW * WINDOW
    assert idx.shape == (n, n)
    assert idx.min() >= 0 and idx.max() < (2 * WINDOW - 1) ** 2
    # symmetric pairs map to mirrored offsets: diag is the zero-offset bin
    center = (WINDOW - 1) * (2 * WINDOW - 1) + (WINDOW - 1)
    assert (np.diag(idx) == center).all()


def test_shift_mask_blocks_cross_boundary():
    hp = wp = 2 * WINDOW
    m = _shift_mask(hp, wp, WINDOW // 2)
    assert m.shape == (4, WINDOW * WINDOW, WINDOW * WINDOW)
    # the first (interior) window has no boundary crossings
    np.testing.assert_allclose(m[0], 0.0)
    # the last (corner) window mixes 4 regions -> some -100 entries
    assert (m[-1] == -100.0).any()
    # mask is symmetric (same-region predicate)
    np.testing.assert_allclose(m[-1], m[-1].T)


def test_swin_tiny_shapes_and_params():
    model = SwinTransformer(arch="tiny")
    x = jnp.zeros((1, 224, 224, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(vars_, x)
    assert [o.shape for o in outs] == [
        (1, 56, 56, 96), (1, 28, 28, 192), (1, 14, 14, 384),
        (1, 7, 7, 768)]
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(vars_["params"]))
    # Swin-T backbone is ~27.5M params (sans classification head)
    assert 26e6 < n < 29e6, n


def test_swin_shifted_blocks_change_output():
    """With distinct content across window boundaries, the SW-MSA block
    must mix information W-MSA alone cannot (roll + masking active)."""
    model = SwinTransformer(arch="tiny", out_indices=(0,))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 224, 224, 3).astype(np.float32) * 0.1)
    vars_ = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(vars_, x)[0]
    assert np.isfinite(np.asarray(out)).all()
    # gradient flows to the relative position bias of a shifted block
    def f(p):
        return jnp.sum(model.apply({"params": p}, x)[0] ** 2)
    g = jax.grad(f)(vars_["params"])
    gb = g["stage0_block1"]["attn"]["rel_bias"]
    assert float(jnp.abs(gb).max()) > 0


def test_swin_drop_path_stochastic_train_identity_eval():
    """Stochastic depth (reference swin.py:540 drop_path_rate, detection
    recipes 0.2): per-sample residual drops at train, identity at eval."""
    model = SwinTransformer(arch="tiny", out_indices=(3,),
                            drop_path_rate=0.5)
    x = jnp.ones((2, 56, 56, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    e1 = model.apply(v, x)[-1]
    e2 = model.apply(v, x)[-1]
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))
    t1 = model.apply(v, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})[-1]
    t2 = model.apply(v, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})[-1]
    diff = np.abs(np.asarray(t1) - np.asarray(t2)).max()
    assert diff > 0.01 * np.abs(np.asarray(t1)).max()

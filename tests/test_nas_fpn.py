"""NAS-FPN: merge-cell resizing, GP attention, DAG shapes, BN mutation."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.nas_fpn import NASFPN, _MergeCell, _resize_to


def test_resize_to():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    up = _resize_to(x, (8, 8))
    assert up.shape == (1, 8, 8, 1)
    np.testing.assert_allclose(np.asarray(up)[0, :2, :2, 0],
                               np.asarray(x)[0, 0, 0, 0])
    down = _resize_to(x, (2, 2))
    assert down.shape == (1, 2, 2, 1)
    assert float(down[0, 0, 0, 0]) == 5.0     # max of the 2x2 block


def test_merge_cells():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(1, 4, 4, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(1, 4, 4, 8).astype(np.float32))
    cell = _MergeCell(8, "gp", with_out_conv=False)
    v = cell.init(jax.random.PRNGKey(0), a, b, (4, 4))
    out = cell.apply(v, a, b, (4, 4))
    att = 1.0 / (1.0 + np.exp(-np.asarray(b).mean((1, 2), keepdims=True)))
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(b) + att * np.asarray(a),
                               rtol=1e-5)


def test_nas_fpn_shapes_and_bn():
    rng = np.random.RandomState(0)
    inputs = tuple(jnp.asarray(rng.randn(1, s, s, c).astype(np.float32))
                   for s, c in ((16, 32), (8, 64), (4, 128)))
    neck = NASFPN(out_channels=32, num_outs=5, stack_times=2)
    v = neck.init(jax.random.PRNGKey(0), inputs)
    outs = neck.apply(v, inputs)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 32), (1, 8, 8, 32), (1, 4, 4, 32), (1, 2, 2, 32),
        (1, 1, 1, 32)]
    # trainable BN mutates running stats
    _, mutated = neck.apply(v, inputs, False, mutable=["batch_stats"])
    b0 = jax.tree.leaves(v["batch_stats"])[0]
    b1 = jax.tree.leaves(mutated["batch_stats"])[0]
    assert b0.shape == b1.shape


def test_nasfcos_fpn_and_family():
    """NASFCOS searched FPN: DAG shapes + FCOS pairing forward."""
    from dskd_tpu.models.nasfcos_fpn import NASFCOSFPN

    rng = np.random.RandomState(0)
    inputs = tuple(jnp.asarray(rng.randn(1, s, s, c).astype(np.float32))
                   for s, c in ((16, 32), (8, 64), (4, 128)))
    neck = NASFCOSFPN(out_channels=32, num_outs=5)
    v = neck.init(jax.random.PRNGKey(0), inputs)
    outs = neck.apply(v, inputs)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 32), (1, 8, 8, 32), (1, 4, 4, 32), (1, 2, 2, 32),
        (1, 1, 1, 32)]
    # searched cells exist by name
    assert "c22_1" in v["params"] and "c61" in v["params"]

    from dskd_tpu.models.fcos import FCOS
    model = FCOS(num_classes=6, depth=18, nas_fpn=True)
    x = jnp.zeros((1, 64, 64, 3))
    hw = jnp.array([[64, 64]], jnp.int32)
    mv = model.init(jax.random.PRNGKey(0), x, hw)
    out = model.apply(mv, x, hw)
    assert len(out.head.cls_scores) == 5

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


def test_retinanet_nasfpn_sepbn_family_step():
    """NAS-FPN retina family: shared conv weights, per-level BN stats
    (RetinaSepBNHead), BN trained through the family step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dskd_tpu.models.retinanet import RetinaNet
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    rng = np.random.RandomState(0)
    B, HW, G, NC = 1, 64, 3, 5
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, G, 2).astype(np.float32) * 20
    wh = rng.rand(B, G, 2).astype(np.float32) * 25 + 10
    batch = Batch(images, img_hw,
                  jnp.asarray(np.concatenate([xy, xy + wh], -1)),
                  jnp.asarray(rng.randint(0, NC, (B, G)).astype(np.int32)),
                  jnp.asarray(np.tile(np.arange(G) < 2, (B, 1))))
    model = RetinaNet(num_classes=NC, depth=18, neck="nasfpn")
    cfg = ExperimentConfig(
        model=ModelConfig(arch="retinanet_nasfpn", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw,
                   deterministic=False)
    bh = v["params"]["bbox_head"]
    # per-level BN params exist; conv weights are shared (no per-level)
    assert "cls_bn0_lvl0" in bh and "cls_bn0_lvl4" in bh
    assert "cls_conv0" in bh and "cls_conv0_lvl1" not in bh
    assert "bbox_head" in v["batch_stats"]
    # snapshot BEFORE the step: it donates the state buffers
    before = np.asarray(
        v["batch_stats"]["bbox_head"]["cls_bn0_lvl0"]["mean"]).copy()
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v["batch_stats"], tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("retinanet_nasfpn", model, cfg,
                                  num_prev=0, has_teacher=False,
                                  use_dropout=False)
    new_state, losses = step(state, batch)
    assert np.isfinite(float(losses["loss"]))
    after = np.asarray(
        new_state.batch_stats["bbox_head"]["cls_bn0_lvl0"]["mean"])
    assert not np.allclose(before, after)

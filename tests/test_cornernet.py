"""CornerNet + Hourglass: pool-block geometry, gaussian targets,
pair decode round-trip, losses, one train step."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.cornernet import (CornerLossConfig, CornerNet,
                                       corner_targets,
                                       cornernet_get_bboxes,
                                       cornernet_loss, gaussian_radius)
from dskd_tpu.models.hourglass import HourglassNet

B, HW, NC = 1, 64, 5


def test_hourglass_shapes_and_bn_mutation():
    m = HourglassNet(num_stacks=2, feat_channels=64)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(v, x)
    assert [f.shape for f in feats] == [(1, 16, 16, 64)] * 2
    # train-mode apply updates running stats
    _, mutated = m.apply(v, jnp.ones((1, 64, 64, 3)), False,
                         mutable=["batch_stats"])
    before = jax.tree.leaves(v["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(float(jnp.abs(a - b).max()) > 0
               for a, b in zip(after, before))


def test_gaussian_radius_monotone():
    r_small = float(gaussian_radius(8.0, 8.0))
    r_big = float(gaussian_radius(32.0, 32.0))
    assert 0 < r_small < r_big


def test_corner_targets_peaks_and_offsets():
    gt = jnp.asarray(np.array([[10.0, 14.0, 50.0, 46.0]], np.float32))
    labels = jnp.asarray(np.array([2], np.int32))
    valid = jnp.asarray(np.array([True]))
    tl_h, br_h, tl_o, br_o, tl_i, br_i = corner_targets(
        gt, labels, valid, 16, 16, NC, stride=4)
    # tl corner at (10/4, 14/4) = (2.5, 3.5) -> cell (y=3, x=2)
    assert int(tl_i[0]) == 3 * 16 + 2
    assert float(tl_h[3, 2, 2]) == 1.0          # exact peak at the corner
    np.testing.assert_allclose(np.asarray(tl_o[0]), [0.5, 0.5])
    # br corner (50/4, 46/4) = (12.5, 11.5) -> cell (y=11, x=12)
    assert int(br_i[0]) == 11 * 16 + 12
    assert float(br_h[11, 12, 2]) == 1.0
    # gaussian decays away from the peak
    assert float(tl_h[3, 5, 2]) < 1.0


def test_cornernet_forward_loss_decode_and_step():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    gt = jnp.asarray(np.array([[[8, 8, 40, 36], [20, 24, 56, 60],
                                [0, 0, 0, 0]]], np.float32))
    labels = jnp.asarray(np.array([[1, 3, 0]], np.int32))
    valid = jnp.asarray(np.array([[True, True, False]]))

    model = CornerNet(num_classes=NC, num_stacks=1)
    v = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(v, images, img_hw)
    assert out.head.tl_heats[0].shape == (B, 16, 16, NC)

    losses = cornernet_loss(out.head, gt, labels, valid,
                            CornerLossConfig(num_classes=NC))
    assert {"loss_heatmap", "loss_pull", "loss_push",
            "loss_offset"} == set(losses)
    for k, x in losses.items():
        assert np.isfinite(float(x)), (k, float(x))

    d = cornernet_get_bboxes(out.head, img_hw, k=20, max_per_img=10)
    bb = np.asarray(d["bboxes"])
    assert bb.shape == (B, 10, 4)
    # geometry constraint: decoded boxes are non-degenerate where valid
    va = np.asarray(d["valid"])[0]
    if va.any():
        assert (bb[0][va][:, 2] >= bb[0][va][:, 0]).all()

    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="cornernet", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    # snapshot BEFORE stepping: the jitted step donates the state buffers
    b0 = np.asarray(jax.tree.leaves(v["batch_stats"])[0])
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v["batch_stats"], tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("cornernet", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    new_state, losses = step(state, Batch(images, img_hw, gt, labels,
                                          valid))
    assert np.isfinite(float(losses["loss"]))
    # BN running stats moved (trainable-BN family)
    b1 = np.asarray(jax.tree.leaves(new_state.batch_stats)[0])
    assert b1.shape == b0.shape

def test_centripetalnet_forward_loss_decode_step():
    """CentripetalNet: shift targets, loss structure, gated pair decode,
    one train step."""
    from dskd_tpu.models.centripetal import (CentripetalLossConfig,
                                             CentripetalNet,
                                             _shift_targets,
                                             centripetalnet_get_bboxes,
                                             centripetalnet_loss)

    # shift-target algebra: gt [8,8,40,36]/4 -> tl corner (2,2), center
    # (6, 5.5): guiding = center - floor(corner); centripetal = log(c-side)
    gt1 = jnp.asarray(np.array([[8.0, 8.0, 40.0, 36.0]]))
    tg, bg_, tc, bc_ = _shift_targets(gt1, jnp.asarray([True]), 16, 16)
    np.testing.assert_allclose(np.asarray(tg[0]), [4.0, 3.5])
    np.testing.assert_allclose(np.asarray(tc[0]),
                               np.log([4.0, 3.5]), rtol=1e-5)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    gt = jnp.asarray(np.array([[[8, 8, 40, 36], [20, 24, 56, 60],
                                [0, 0, 0, 0]]], np.float32))
    labels = jnp.asarray(np.array([[1, 3, 0]], np.int32))
    valid = jnp.asarray(np.array([[True, True, False]]))

    model = CentripetalNet(num_classes=NC, num_stacks=1)
    v = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(v, images, img_hw)
    assert out.head.tl_centripetal[0].shape[-1] == 2

    losses = centripetalnet_loss(out.head, gt, labels, valid,
                                 CentripetalLossConfig(num_classes=NC))
    assert {"loss_heatmap", "loss_offset", "loss_guiding",
            "loss_centripetal"} == set(losses)
    for key, x in losses.items():
        assert np.isfinite(float(x)), (key, float(x))

    d = centripetalnet_get_bboxes(out.head, img_hw, k=20, max_per_img=10)
    assert d["bboxes"].shape == (B, 10, 4)

    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="centripetalnet", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v["batch_stats"], tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("centripetalnet", model, cfg,
                                  num_prev=0, has_teacher=False,
                                  use_dropout=False)
    _, losses = step(state, Batch(images, img_hw, gt, labels, valid))
    assert np.isfinite(float(losses["loss"]))

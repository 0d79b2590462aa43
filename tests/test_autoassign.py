"""AutoAssign: center-prior geometry, loss structure, decode, train step."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.autoassign import (AutoAssign, AutoAssignLossConfig,
                                        autoassign_get_bboxes,
                                        autoassign_loss)

B, HW, NC = 2, 64, 6


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, 3, 2).astype(np.float32) * 20
    wh = rng.rand(B, 3, 2).astype(np.float32) * 25 + 10
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, NC, (B, 3)).astype(np.int32))
    valid = jnp.asarray(np.tile(np.arange(3) < 2, (B, 1)))
    return images, img_hw, gt, labels, valid


def test_autoassign_forward_loss_decode_step():
    images, img_hw, gt, labels, valid = _inputs()
    model = AutoAssign(num_classes=NC, depth=18)
    v = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(v, images, img_hw)
    # reg bias 4.0: distances start positive and non-trivial
    assert (np.asarray(out.head.bbox_preds[0]) >= 0).all()
    assert out.prior_mean.shape == (NC, 2)

    losses = autoassign_loss(out.head, out.prior_mean, out.prior_sigma,
                             gt, labels, valid,
                             AutoAssignLossConfig(num_classes=NC))
    assert {"loss_pos", "loss_neg", "loss_center"} == set(losses)
    for k, x in losses.items():
        assert np.isfinite(float(x)), (k, float(x))
    # the prior params receive gradients through loss_center + loss_pos
    g = jax.grad(lambda m: autoassign_loss(
        out.head, m, out.prior_sigma, gt, labels, valid,
        AutoAssignLossConfig(num_classes=NC))["loss_pos"])(out.prior_mean)
    assert float(jnp.abs(g).max()) > 0

    d = autoassign_get_bboxes(out.head, img_hw, score_thr=-1.0,
                              max_per_img=5)
    assert d["bboxes"].shape == (B, 5, 4)

    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="autoassign", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("autoassign", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, Batch(images, img_hw, gt, labels, valid))
    assert np.isfinite(float(losses["loss"]))

"""QueryInst: assignment inversion, dice loss, dynamic mask head."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.queryinst import (QueryInst, dice_loss,
                                       invert_assignment)

NC = 5


def _tiny_batch(B=1, HW=64, G=3):
    from dskd_tpu.train.step import Batch
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, G, 2).astype(np.float32) * 20
    wh = rng.rand(B, G, 2).astype(np.float32) * 25 + 10
    gtb = np.concatenate([xy, xy + wh], -1)
    yy, xx = np.mgrid[0:HW // 4, 0:HW // 4]
    gm = ((yy[None, None] * 4 >= gtb[:, :, 1, None, None])
          & (yy[None, None] * 4 <= gtb[:, :, 3, None, None])
          & (xx[None, None] * 4 >= gtb[:, :, 0, None, None])
          & (xx[None, None] * 4 <= gtb[:, :, 2, None, None]))
    return Batch(images, img_hw, jnp.asarray(gtb),
                 jnp.asarray(rng.randint(0, NC, (B, G)).astype(np.int32)),
                 jnp.asarray(np.tile(np.arange(G) < 2, (B, 1))),
                 gt_masks=jnp.asarray(gm.astype(np.float32)))


def test_invert_assignment():
    assigned = jnp.asarray([[2, -1, 0, -1]])
    pos = jnp.asarray([[True, False, True, False]])
    qidx, matched = invert_assignment(assigned, pos, 3)
    np.testing.assert_array_equal(np.asarray(matched[0]),
                                  [True, False, True])
    assert int(qidx[0, 0]) == 2 and int(qidx[0, 2]) == 0


def test_dice_loss_perfect_and_worst():
    t = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8) > 0.5,
                    jnp.float32)
    v = jnp.ones((2,), bool)
    assert float(dice_loss(t, t, v)) < 1e-4
    assert float(dice_loss(1.0 - t, t, v)) > 0.99
    # invalid instances drop out
    assert float(dice_loss(1.0 - t, t, jnp.zeros((2,), bool))) == 0.0


def test_queryinst_family_step():
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    model = QueryInst(num_classes=NC, depth=18, num_proposals=8,
                      num_stages=2)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="queryinst", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    batch = _tiny_batch()
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw,
                   method=QueryInst.init_all)
    assert "mask_head0" in v["params"] and "mask_head1" in v["params"]
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("queryinst", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, batch)
    assert "loss_mask" in losses and "s0.loss_mask" in losses
    assert "loss_cls" in losses and "loss_iou" in losses
    assert np.isfinite(float(losses["loss"]))


def test_queryinst_eval_step():
    from dskd_tpu.eval.evaluator import make_eval_step

    model = QueryInst(num_classes=NC, depth=18, num_proposals=8,
                      num_stages=2)
    B, HW = 1, 64
    images = jnp.zeros((B, HW, HW, 3))
    img_hw = jnp.asarray([[HW, HW]], np.int32)
    v = model.init(jax.random.PRNGKey(0), images, img_hw,
                   method=QueryInst.init_all)
    step = make_eval_step(model, max_per_img=8, arch="queryinst")
    det = step(v, images, img_hw, jnp.ones((B, 4)))
    assert det.masks.shape == (B, 8, 28, 28)
    assert det.bboxes.shape == (B, 8, 4)
    assert np.all(np.asarray(det.masks) >= 0)
    assert np.all(np.asarray(det.masks) <= 1)

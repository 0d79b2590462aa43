"""Cascade Mask R-CNN: per-stage mask heads, stage-weighted losses,
stage-averaged mask inference."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.cascade_mask_rcnn import (CascadeMaskRCNN,
                                               cascade_mask_probs)

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


def test_cascade_mask_family_step():
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    model = CascadeMaskRCNN(num_classes=NC, depth=18)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="cascade_mask_rcnn", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    cfg.rcnn_num_proposals = 16
    cfg.rcnn_num_samples = 16
    batch = _tiny_batch()
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw,
                   method=CascadeMaskRCNN.init_all)
    # three independent mask heads exist
    assert all(f"mask_head{i}" in v["params"] for i in range(3))
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("cascade_mask_rcnn", model, cfg,
                                  num_prev=0, has_teacher=False,
                                  use_dropout=False)
    _, losses = step(state, batch)
    for st in range(3):
        assert f"s{st}.loss_mask" in losses
        assert f"s{st}.loss_cls" in losses
    assert np.isfinite(float(losses["loss"]))


def test_cascade_mask_probs_averages_stages():
    model = CascadeMaskRCNN(num_classes=NC, depth=18)
    B, HW = 1, 64
    images = jax.random.normal(jax.random.PRNGKey(3), (B, HW, HW, 3))
    img_hw = jnp.asarray([[HW, HW]], np.int32)
    v = model.init(jax.random.PRNGKey(0), images, img_hw,
                   method=CascadeMaskRCNN.init_all)
    out = model.apply(v, images, img_hw)
    boxes = jnp.asarray([[[4, 4, 30, 30], [10, 10, 50, 50]]], jnp.float32)
    valid = jnp.ones((1, 2), bool)
    probs = cascade_mask_probs(model, v, out.neck_feats, boxes, valid)
    assert probs.shape == (1, 2, 28, 28, NC)
    assert np.all(np.asarray(probs) >= 0) and np.all(np.asarray(probs) <= 1)
    # average differs from any single stage (heads are independently init)
    from dskd_tpu.models.mask_rcnn import mask_rcnn_get_masks
    one = mask_rcnn_get_masks(
        model, v, out.neck_feats, boxes, valid,
        method=lambda m, f: CascadeMaskRCNN.mask_forward(m, f, 0))
    assert not np.allclose(np.asarray(one), np.asarray(probs))


def test_cascade_mask_eval_step():
    from dskd_tpu.eval.evaluator import make_eval_step

    model = CascadeMaskRCNN(num_classes=NC, depth=18)
    B, HW = 1, 64
    images = jnp.zeros((B, HW, HW, 3))
    img_hw = jnp.asarray([[HW, HW]], np.int32)
    v = model.init(jax.random.PRNGKey(0), images, img_hw,
                   method=CascadeMaskRCNN.init_all)
    step = make_eval_step(model, max_per_img=8, arch="cascade_mask_rcnn")
    det = step(v, images, img_hw, jnp.ones((B, 4)))
    assert det.masks.shape == (B, 8, 28, 28)
    assert det.bboxes.shape == (B, 8, 4)

"""HTC: semantic branch + fusion, interleaved cascade, mask info flow."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.htc import HTC, htc_mask_probs, semantic_seg_loss

NC = 5
SEM = 7


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
    sem = rng.randint(0, SEM, (B, HW // 4, HW // 4)).astype(np.int32)
    sem[:, :2] = 255                     # some void pixels
    return Batch(images, img_hw, jnp.asarray(gtb),
                 jnp.asarray(rng.randint(0, NC, (B, G)).astype(np.int32)),
                 jnp.asarray(np.tile(np.arange(G) < 2, (B, 1))),
                 gt_masks=jnp.asarray(gm.astype(np.float32)),
                 gt_semantic=jnp.asarray(sem))


def _model_and_vars(HW=64):
    model = HTC(num_classes=NC, depth=18, semantic_classes=SEM)
    images = jnp.zeros((1, HW, HW, 3))
    img_hw = jnp.asarray([[HW, HW]], np.int32)
    v = model.init(jax.random.PRNGKey(0), images, img_hw,
                   method=HTC.init_all)
    return model, v


def test_htc_family_step():
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    model = HTC(num_classes=NC, depth=18, semantic_classes=SEM)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="htc", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    cfg.rcnn_num_proposals = 16
    cfg.rcnn_num_samples = 16
    batch = _tiny_batch()
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw,
                   method=HTC.init_all)
    # info-flow conv_res exists on stages 1-2 only (stage 0 never fuses)
    assert "conv_res" not in v["params"]["mask_head0"]
    assert "conv_res" in v["params"]["mask_head1"]
    assert "semantic_head" in v["params"]
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("htc", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, batch)
    assert "loss_semantic_seg" in losses
    for st in range(3):
        assert f"s{st}.loss_mask" in losses
        assert f"s{st}.loss_cls" in losses
    assert np.isfinite(float(losses["loss"]))


def test_htc_semantic_loss_ignores_void():
    rng = np.random.RandomState(1)
    pred = jnp.asarray(rng.randn(1, 8, 8, SEM).astype(np.float32))
    gt = np.zeros((1, 16, 16), np.int32)
    gt[:] = 255                             # all void -> zero loss
    assert float(semantic_seg_loss(pred, jnp.asarray(gt))) == 0.0
    gt[0, 0, 0] = 3
    assert float(semantic_seg_loss(pred, jnp.asarray(gt))) > 0.0


def test_htc_mask_flow_differs_from_flowless():
    """The info-flow chain must actually change stage-2's logits vs
    running its head standalone."""
    model, v = _model_and_vars()
    f14 = jax.random.normal(jax.random.PRNGKey(2), (2, 14, 14, 256))
    flow = model.apply(v, f14, 2, method=HTC.mask_forward_flow)
    solo = model.apply(v, f14, 0, method=HTC.mask_forward_flow)
    assert flow.shape == (2, 28, 28, NC)
    assert not np.allclose(np.asarray(flow), np.asarray(solo))


def test_htc_eval_step():
    from dskd_tpu.eval.evaluator import make_eval_step

    model, v = _model_and_vars()
    B, HW = 1, 64
    images = jnp.zeros((B, HW, HW, 3))
    img_hw = jnp.asarray([[HW, HW]], np.int32)
    step = make_eval_step(model, max_per_img=8, arch="htc")
    det = step(v, images, img_hw, jnp.ones((B, 4)))
    assert det.masks.shape == (B, 8, 28, 28)
    assert det.bboxes.shape == (B, 8, 4)
    out = model.apply(v, images, img_hw)
    boxes = jnp.asarray([[[4, 4, 30, 30]]], jnp.float32)
    probs = htc_mask_probs(model, v, out, boxes, jnp.ones((1, 1), bool))
    assert probs.shape == (1, 1, 28, 28, NC)
    assert np.all(np.asarray(probs) >= 0) and np.all(np.asarray(probs) <= 1)

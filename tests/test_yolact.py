"""YOLACT: anchor geometry, crop-mask semantics vs a numpy restatement of
the reference crop(), loss step finiteness + OHEM budget, decode shapes,
family train step and eval step."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.yolact import (YOLACT, YOLACTLossConfig, _crop_mask,
                                    yolact_anchors, yolact_decode,
                                    yolact_loss)

NC = 4


def test_yolact_anchor_geometry():
    a = np.asarray(yolact_anchors([(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]))
    assert a.shape == (3 * (64 + 16 + 4 + 1 + 1), 4)
    # level-0 square anchor: size 3 * 8 = 24 centered on the grid
    sq = a[1]                       # ratio 1.0 is second
    assert np.isclose(sq[2] - sq[0], 24.0) and np.isclose(sq[3] - sq[1], 24.0)
    # last-level square anchor: 3 * 128
    sq4 = a[-2]
    assert np.isclose(sq4[2] - sq4[0], 384.0)


def test_crop_mask_matches_reference_sanitize():
    """crop() zeroes everything outside the box, padded by 1 mask pixel
    (yolact_head.py sanitize_coordinates with padding=1)."""
    boxes = jnp.asarray([[8.0, 8.0, 24.0, 16.0]])    # canvas coords
    m = np.asarray(_crop_mask(8, 8, boxes, stride=4.0))[0]
    # box in mask grid: x 2..6, y 2..4, +-1 padding -> x 1..7, y 1..5
    assert m[3, 4] == 1.0
    assert m[0, 4] == 0.0 and m[6, 4] == 0.0
    assert m[3, 0] == 0.0 and m[1, 1] == 1.0


def _model_and_batch(B=1, HW=64, G=3):
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
    model = YOLACT(num_classes=NC, depth=18)
    batch = Batch(images, img_hw, jnp.asarray(gtb),
                  jnp.asarray(rng.randint(0, NC, (B, G)).astype(np.int32)),
                  jnp.asarray(np.tile(np.arange(G) < 2, (B, 1))),
                  gt_masks=jnp.asarray(gm.astype(np.float32)))
    return model, batch


def test_yolact_loss_and_family_step():
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    model, batch = _model_and_batch()
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw)
    out = model.apply(v, batch.images, batch.img_hw)
    # protos at stride 4, segm at stride 8
    assert out.protos.shape == (1, 16, 16, 32)
    assert out.segm_pred.shape == (1, 8, 8, NC)
    sizes = [tuple(c.shape[1:3]) for c in out.head.cls_scores]
    anchors = yolact_anchors(sizes)
    losses = yolact_loss(out, anchors, batch.gt_bboxes, batch.gt_labels,
                         batch.gt_valid, batch.gt_masks, (64, 64),
                         YOLACTLossConfig(num_classes=NC, mask_budget=8))
    for k in ("loss_cls", "loss_bbox", "loss_mask", "loss_segm"):
        assert np.isfinite(float(losses[k])), k
    assert float(losses["loss_mask"]) > 0

    cfg = ExperimentConfig(
        model=ModelConfig(arch="yolact", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    step = make_family_train_step("yolact", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    _, ls = step(state, batch)
    assert np.isfinite(float(ls["loss"]))


def test_yolact_decode_and_eval_step():
    from dskd_tpu.eval.evaluator import make_eval_step

    model, batch = _model_and_batch()
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw)
    out = model.apply(v, batch.images, batch.img_hw)
    sizes = [tuple(c.shape[1:3]) for c in out.head.cls_scores]
    anchors = yolact_anchors(sizes)
    d = yolact_decode(out, anchors, batch.img_hw, NC, score_thr=0.0,
                      nms_pre=16, max_per_img=8)
    assert d["bboxes"].shape == (1, 8, 4)
    assert d["masks28"].shape == (1, 8, 28, 28)

    step = make_eval_step(model, max_per_img=8, arch="yolact")
    det = step(v, batch.images, batch.img_hw, jnp.ones((1, 4)))
    assert det.masks.shape == (1, 8, 28, 28)

"""Mask Scoring R-CNN: MaskIoU head shapes, IoU-target oracle (numpy
restatement of maskiou_head.py get_targets), family train step with
loss_mask_iou, IoU-rescored eval step."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.ms_rcnn import (MaskIoUHead, MSRCNN, maskiou_loss,
                                     maskiou_targets)

NC = 5


def test_maskiou_head_shapes():
    head = MaskIoUHead(num_classes=NC, channels=16, fc_channels=32)
    feat = jnp.zeros((3, 14, 14, 16))
    pred = jnp.zeros((3, 28, 28))
    v = head.init(jax.random.PRNGKey(0), feat, pred)
    out = head.apply(v, feat, pred)
    assert out.shape == (3, NC)
    # conv3 runs stride 2: the first fc sees 7*7*channels inputs
    assert v["params"]["fc0"]["kernel"].shape[0] == 7 * 7 * 16


def test_maskiou_targets_oracle():
    """Numpy restatement of maskiou_head.py:99-146: iou = overlap /
    (pred_area + in_box_target_area / area_ratio - overlap)."""
    P, Hm, Wm, stride = 2, 16, 16, 4
    rng = np.random.RandomState(0)
    # instance bitmap: a blob partially outside the roi
    gm = np.zeros((P, Hm, Wm), np.float32)
    gm[0, 2:10, 2:10] = 1.0
    gm[1, 0:16, 0:8] = 1.0
    rois = np.array([[8, 8, 40, 40], [0, 0, 32, 64]], np.float32)
    tgt = (rng.rand(P, 28, 28) > 0.5).astype(np.float32)
    logits = rng.randn(P, 28, 28).astype(np.float32) * 3

    got = np.asarray(maskiou_targets(jnp.asarray(logits), jnp.asarray(tgt),
                                     jnp.asarray(rois), jnp.asarray(gm),
                                     mask_stride=stride))
    for p in range(P):
        # reference quirk: RAW logits compared to mask_thr_binary=0.5
        pred = (logits[p] > 0.5).astype(np.float32)
        overlap = (pred * tgt[p]).sum()
        # area ratio via pixel-center membership on the stride-4 grid
        yc = (np.arange(Hm) + 0.5) * stride
        xc = (np.arange(Wm) + 0.5) * stride
        inside = ((yc[:, None] >= rois[p, 1]) & (yc[:, None] <= rois[p, 3])
                  & (xc[None] >= rois[p, 0]) & (xc[None] <= rois[p, 2]))
        ratio = (gm[p] * inside).sum() / max(gm[p].sum(), 1e-7)
        gt_full = tgt[p].sum() / (ratio + 1e-7)
        want = overlap / max(pred.sum() + gt_full - overlap, 1e-7)
        np.testing.assert_allclose(got[p], want, rtol=1e-5)
    # fully-inside instance: ratio 1 -> target <= 1
    assert np.all(got <= 1.0 + 1e-6)


def test_maskiou_loss_masking():
    pred = jnp.asarray([0.8, 0.2, 0.5])
    tgt = jnp.asarray([0.6, 0.0, 0.9])
    valid = jnp.asarray([True, True, False])
    # only the first element counts (tgt>0 and valid)
    want = 0.5 * (0.8 - 0.6) ** 2
    np.testing.assert_allclose(float(maskiou_loss(pred, tgt, valid)),
                               want, rtol=1e-6)


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


def test_ms_rcnn_family_step():
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    model = MSRCNN(num_classes=NC, depth=18)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="ms_rcnn", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    cfg.rcnn_num_proposals = 16
    cfg.rcnn_num_samples = 16
    batch = _tiny_batch()
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw,
                   method=MSRCNN.init_all)
    assert "mask_iou_head" in v["params"]
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("ms_rcnn", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    # push the mask head's final bias up so some logits clear the raw
    # 0.5 target threshold at init (maskiou targets are zero otherwise,
    # exactly as in reference early training)
    import flax
    params = flax.core.unfreeze(state.params) if hasattr(
        flax.core, "unfreeze") else state.params
    mh = params["mask_head"]
    def bump(d):
        for k, v in d.items():
            if isinstance(v, dict):
                bump(v)
            elif k == "bias":
                d[k] = v + 1.0
    bump(mh)
    state = state.replace(params=params)
    # snapshot before the step: the train step donates its input state
    before = jax.tree_util.tree_map(np.asarray,
                                    state.params["mask_iou_head"])
    state2, losses = step(state, batch)
    assert "loss_mask" in losses and "loss_mask_iou" in losses
    assert np.isfinite(float(losses["loss"]))
    # the maskiou branch must receive gradients
    g = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(
            lambda a, b: float(np.abs(a - np.asarray(b)).max()),
            before, state2.params["mask_iou_head"]))
    assert max(g) > 0


def test_ms_rcnn_eval_step_rescoring():
    from dskd_tpu.eval.evaluator import make_eval_step

    model = MSRCNN(num_classes=NC, depth=18)
    B, HW = 1, 64
    images = jnp.zeros((B, HW, HW, 3))
    img_hw = jnp.asarray([[HW, HW]], np.int32)
    v = model.init(jax.random.PRNGKey(0), images, img_hw,
                   method=MSRCNN.init_all)
    step = make_eval_step(model, max_per_img=8, arch="ms_rcnn")
    det = step(v, images, img_hw, jnp.ones((B, 4)))
    assert det.masks.shape == (B, 8, 28, 28)
    assert det.mask_scores.shape == (B, 8)
    ms = np.asarray(det.mask_scores)
    s = np.asarray(det.scores)
    # rescored = cls_score * clip(iou, 0, 1) <= cls_score
    assert np.all(ms <= s + 1e-6)

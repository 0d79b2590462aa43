"""SOLO: vectorized grid-paint targets vs a numpy restatement of the
reference's per-GT loop (incl. overwrite order), dice/focal loss step,
static decode, family train step."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.solo import (SOLO, SOLOHead, solo_decode, solo_loss,
                                  solo_targets)

NC = 4


def _paint_oracle(boxes, labels, valid, masks, H, W, S, lo, hi,
                  pos_scale=0.2, stride=4):
    """Reference _get_targets_single semantics, one level, numpy."""
    G = len(labels)
    label_map = np.full((S, S), NC, np.int64)
    assign = np.zeros((S, S), np.int64)
    areas = np.sqrt(np.clip((boxes[:, 2] - boxes[:, 0])
                            * (boxes[:, 3] - boxes[:, 1]), 0, None))
    for g in range(G):                      # reference GT order
        if not valid[g] or masks[g].sum() == 0:
            continue
        if not (lo <= areas[g] <= hi):
            continue
        ys, xs = np.nonzero(masks[g])
        cy = ((ys + 0.5) * stride).mean()
        cx = ((xs + 0.5) * stride).mean()
        ch = min(S - 1, int(cy / H * S))
        cw = min(S - 1, int(cx / W * S))
        hh = 0.5 * (boxes[g, 3] - boxes[g, 1]) * pos_scale
        hw = 0.5 * (boxes[g, 2] - boxes[g, 0]) * pos_scale
        top = max(max(0, int((cy - hh) / H * S)), ch - 1)
        down = min(min(S - 1, int((cy + hh) / H * S)), ch + 1)
        left = max(max(0, int((cx - hw) / W * S)), cw - 1)
        right = min(min(S - 1, int((cx + hw) / W * S)), cw + 1)
        label_map[top:down + 1, left:right + 1] = labels[g]
        assign[top:down + 1, left:right + 1] = g + 1
    return label_map, assign


def test_solo_targets_oracle_with_overwrite():
    H = W = 128
    S, lo, hi = 8, 1, 1000
    boxes = np.array([[10, 10, 60, 60], [20, 20, 70, 70],
                      [100, 100, 120, 120]], np.float32)
    labels = np.array([1, 2, 3], np.int32)
    valid = np.array([True, True, True])
    masks = np.zeros((3, H // 4, W // 4), np.float32)
    for g in range(3):
        x1, y1, x2, y2 = (boxes[g] / 4).astype(int)
        masks[g, y1:y2, x1:x2] = 1.0

    got = solo_targets(jnp.asarray(boxes), jnp.asarray(labels),
                       jnp.asarray(valid), jnp.asarray(masks), (H, W),
                       NC, num_grids=(S,), scale_ranges=((lo, hi),))
    lm, asg = (np.asarray(t) for t in got[0])
    w_lm, w_asg = _paint_oracle(boxes, labels, valid, masks, H, W, S,
                                lo, hi)
    np.testing.assert_array_equal(lm, w_lm)
    np.testing.assert_array_equal(asg, w_asg)
    # overlap region: GT 1 (later) must have overwritten GT 0
    assert (asg == 2).sum() > 0 and (asg == 1).sum() > 0


def test_solo_targets_scale_range_filters():
    H = W = 128
    boxes = np.array([[0, 0, 120, 120]], np.float32)   # area ~120
    labels = np.array([0], np.int32)
    masks = np.ones((1, 32, 32), np.float32)
    got = solo_targets(jnp.asarray(boxes), jnp.asarray(labels),
                       jnp.asarray([True]), jnp.asarray(masks), (H, W),
                       NC, num_grids=(8, 8),
                       scale_ranges=((1, 64), (96, 2048)))
    assert (np.asarray(got[0][1]) == 0).all()     # too big for level 0
    assert (np.asarray(got[1][1]) > 0).any()      # assigned on level 1


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
    model = SOLO(num_classes=NC, depth=18, stacked_convs=2)
    batch = Batch(images, img_hw, jnp.asarray(gtb),
                  jnp.asarray(rng.randint(0, NC, (B, G)).astype(np.int32)),
                  jnp.asarray(np.tile(np.arange(G) < 2, (B, 1))),
                  gt_masks=jnp.asarray(gm.astype(np.float32)))
    return model, batch


def test_solo_head_shapes():
    head = SOLOHead(num_classes=NC, stacked_convs=2, feat_channels=32,
                    num_grids=(8, 8, 6, 4, 4))
    feats = [jnp.zeros((1, 16 // 2 ** i, 16 // 2 ** i, 32))
             for i in range(5)]
    v = head.init(jax.random.PRNGKey(0), feats)
    m, c = head.apply(v, feats)
    # level 0 is downsampled then x2-upsampled back: 16x16
    assert m[0].shape == (1, 16, 16, 64)
    assert c[0].shape == (1, 8, 8, NC)
    # last level rides the second-to-last's resolution
    assert m[4].shape == m[3].shape[:3] + (16,)


def test_solo_loss_and_family_step():
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    model, batch = _model_and_batch()
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw)
    out = model.apply(v, batch.images, batch.img_hw)
    losses = solo_loss(out, batch.gt_bboxes, batch.gt_labels,
                       batch.gt_valid, batch.gt_masks, (64, 64), NC)
    assert np.isfinite(float(losses["loss_mask"]))
    assert np.isfinite(float(losses["loss_cls"]))

    cfg = ExperimentConfig(
        model=ModelConfig(arch="solo", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    step = make_family_train_step("solo", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    _, ls = step(state, batch)
    assert np.isfinite(float(ls["loss"]))


def test_solo_decode_and_eval_step():
    from dskd_tpu.eval.evaluator import make_eval_step

    model, batch = _model_and_batch()
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw)
    out = model.apply(v, batch.images, batch.img_hw)
    d = solo_decode(out, (64, 64), NC, score_thr=0.0, nms_pre=16,
                    max_per_img=8, filter_thr=0.0)
    assert d["bboxes"].shape == (1, 8, 4)
    assert d["masks28"].shape == (1, 8, 28, 28)
    b = np.asarray(d["bboxes"])
    va = np.asarray(d["valid"])
    assert np.all(b[va][:, 2] > b[va][:, 0]) if va.any() else True

    step = make_eval_step(model, max_per_img=8, arch="solo")
    det = step(v, batch.images, batch.img_hw, jnp.ones((1, 4)))
    assert det.masks.shape == (1, 8, 28, 28)

"""Faster R-CNN two-stage tests: assigner/sampler/RoIAlign oracles +
end-to-end loss on tiny shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dskd_tpu.core.max_iou_assigner import max_iou_assign, random_sample
from dskd_tpu.ops.roi_align import roi_align


def test_max_iou_assign_thresholds():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 9, 10], [50, 50, 60, 60],
                       [0, 0, 4, 10]], jnp.float32)
    gt = jnp.array([[0, 0, 10, 10], [0, 0, 0, 0]], jnp.float32)
    labels = jnp.array([2, 0], jnp.int32)
    valid = jnp.array([True, False])
    res = max_iou_assign(boxes, gt, labels, valid, num_classes=5,
                         pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3)
    a = np.asarray(res.assigned_gt)
    assert a[0] == 0          # IoU 1.0 -> pos
    assert a[1] == 0          # IoU 0.9 -> pos
    assert a[2] == -1         # IoU 0 -> neg
    assert a[3] == -2         # IoU 0.4 -> ignored
    assert np.asarray(res.labels)[0] == 2


def test_max_iou_low_quality_match():
    # no anchor reaches pos_iou_thr, but the best one is claimed by the gt
    boxes = jnp.array([[0, 0, 10, 6], [20, 0, 30, 6]], jnp.float32)
    gt = jnp.array([[0, 0, 10, 10]], jnp.float32)
    res = max_iou_assign(boxes, gt, jnp.array([1], jnp.int32),
                         jnp.array([True]), num_classes=5,
                         pos_iou_thr=0.9, neg_iou_thr=0.3, min_pos_iou=0.3)
    assert np.asarray(res.assigned_gt)[0] == 0


def test_random_sample_counts():
    rng = jax.random.PRNGKey(0)
    assigned = jnp.array([0] * 10 + [-1] * 100 + [-2] * 5)
    s = random_sample(rng, assigned, num=64, pos_fraction=0.25)
    assert int(s.pos_valid.sum()) == 10          # fewer pos than cap
    assert int(s.neg_valid.sum()) == 48          # fills the neg budget
    # sampled negatives are actual negatives
    assert (np.asarray(assigned)[np.asarray(s.neg_idx)][
        np.asarray(s.neg_valid)] == -1).all()


def test_roi_align_constant_field():
    """On a constant feature map every aligned ROI must return the value."""
    feat = jnp.full((16, 16, 3), 7.0)
    rois = jnp.array([[2.0, 2.0, 10.0, 10.0], [0.0, 0.0, 16.0, 16.0]])
    out = roi_align(feat, rois, out_size=4)
    np.testing.assert_allclose(np.asarray(out), 7.0, rtol=1e-5)


def test_roi_align_linear_ramp():
    """A ramp in x must reproduce bin centers (bilinear exactness)."""
    xs = jnp.arange(16, dtype=jnp.float32)
    feat = jnp.tile(xs[None, :, None], (16, 1, 1))    # f(y, x) = x
    rois = jnp.array([[4.0, 4.0, 12.0, 12.0]])
    out = np.asarray(roi_align(feat, rois, out_size=4, sampling_ratio=2))
    # bin centers along x: 4 + (i + 0.5) * 2 - 0.5 (aligned offset)
    expect = 4 + (np.arange(4) + 0.5) * 2 - 0.5
    np.testing.assert_allclose(out[0, 0, :, 0], expect, atol=1e-4)


def test_faster_rcnn_end_to_end_losses():
    from dskd_tpu.models.faster_rcnn import (BBoxHead, FasterRCNN,
                                             RCNNLossConfig, RPNLossConfig,
                                             rcnn_forward_train, rpn_loss,
                                             rpn_proposals)

    model = FasterRCNN(depth=18, num_classes=6)
    B, H, W = 2, 64, 64
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.1)
    img_hw = jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(variables, images, img_hw)
    assert len(out.rpn.cls_scores) == 5

    xy = rng.rand(B, 4, 2).astype(np.float32) * 30
    wh = rng.rand(B, 4, 2).astype(np.float32) * 20 + 8
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    gt_labels = jnp.asarray(rng.randint(0, 6, (B, 4)).astype(np.int32))
    gt_valid = jnp.asarray(np.tile(np.arange(4) < 3, (B, 1)))

    losses = rpn_loss(out.rpn, gt, gt_valid, img_hw,
                      jax.random.PRNGKey(1), RPNLossConfig())
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    props, scores, valid = rpn_proposals(out.rpn, img_hw, nms_pre=64,
                                         max_total=32)
    assert props.shape == (B, 32, 4)

    head = BBoxHead(num_classes=6)
    head_vars = head.init(jax.random.PRNGKey(2),
                          jnp.zeros((1, 7, 7, 256)))

    rcnn_losses, _ = rcnn_forward_train(
        lambda f: head.apply(head_vars, f), out.neck_feats, props, valid,
        gt, gt_labels, gt_valid, jax.random.PRNGKey(3),
        RCNNLossConfig(num_classes=6, num_samples=32))
    for k, v in rcnn_losses.items():
        assert np.isfinite(float(v)), k


def test_rcnn_get_bboxes_multiclass_nms_parity():
    """The capped top-k decode (nms_pre) must reproduce the exhaustive
    multiclass_nms protocol (bbox_head.get_bboxes -> multiclass_nms:
    every (box, class) pair above score_thr is a candidate; greedy
    class-aware NMS; top max_per_img by score) — brute-forced here in
    numpy over all S*C pairs."""
    from dskd_tpu.core.anchors import delta2bbox
    from dskd_tpu.models.faster_rcnn import (RCNN_TARGET_MEANS,
                                             RCNN_TARGET_STDS, BBoxHead,
                                             rcnn_get_bboxes)

    B, S, C = 2, 12, 5
    H = W = 64
    rng = np.random.RandomState(7)
    neck_feats = [jnp.asarray(rng.randn(B, H // s, W // s, 256)
                              .astype(np.float32) * 0.1)
                  for s in (4, 8, 16, 32)]
    xy = rng.rand(B, S, 2).astype(np.float32) * 40
    wh = rng.rand(B, S, 2).astype(np.float32) * 20 + 4
    props = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    pvalid = jnp.asarray(np.tile(np.arange(S) < S - 2, (B, 1)))
    img_hw = jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32))

    head = BBoxHead(num_classes=C)
    head_vars = head.init(jax.random.PRNGKey(2), jnp.zeros((1, 7, 7, 256)))
    apply_fn = lambda f: head.apply(head_vars, f)

    score_thr, nms_iou, max_per_img = 0.05, 0.5, 6
    d = rcnn_get_bboxes(apply_fn, neck_feats, props, pvalid, img_hw,
                        num_classes=C, score_thr=score_thr,
                        nms_iou=nms_iou, max_per_img=max_per_img)

    # ---- brute force: decode ALL (roi, class) pairs, greedy NMS ----
    from dskd_tpu.ops.roi_align import multi_level_roi_align
    for b in range(B):
        feats_b = tuple(f[b] for f in neck_feats)
        rf = multi_level_roi_align(feats_b, props[b], pvalid[b])
        cls_logits, reg = apply_fn(np.asarray(rf))
        probs = np.asarray(jax.nn.softmax(cls_logits, -1))[:, :C]
        reg = np.asarray(reg).reshape(S, C, 4)
        cands = []
        for s in range(S):
            if not bool(pvalid[b, s]):
                continue
            for c in range(C):
                if probs[s, c] <= score_thr:
                    continue
                box = np.asarray(delta2bbox(
                    props[b, s][None], jnp.asarray(reg[s, c])[None],
                    means=RCNN_TARGET_MEANS, stds=RCNN_TARGET_STDS))[0]
                box = np.clip(box, 0, [W, H, W, H])
                cands.append((float(probs[s, c]), c, box))
        cands.sort(key=lambda t: -t[0])
        kept = []
        for sc, lab, box in cands:
            ok = True
            for sc2, lab2, box2 in kept:
                if lab2 != lab:
                    continue
                ix1 = max(box[0], box2[0]); iy1 = max(box[1], box2[1])
                ix2 = min(box[2], box2[2]); iy2 = min(box[3], box2[3])
                inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
                a1 = max(box[2] - box[0], 0) * max(box[3] - box[1], 0)
                a2 = max(box2[2] - box2[0], 0) * max(box2[3] - box2[1], 0)
                if inter / max(a1 + a2 - inter, 1e-6) > nms_iou:
                    ok = False
                    break
            if ok:
                kept.append((sc, lab, box))
        kept = kept[:max_per_img]

        got_valid = np.asarray(d["valid"][b])
        got_scores = np.asarray(d["scores"][b])[got_valid]
        got_labels = np.asarray(d["labels"][b])[got_valid]
        got_boxes = np.asarray(d["bboxes"][b])[got_valid]
        assert len(kept) == got_valid.sum(), (len(kept), got_valid.sum())
        for i, (sc, lab, box) in enumerate(kept):
            assert abs(sc - got_scores[i]) < 1e-5
            assert lab == got_labels[i]
            np.testing.assert_allclose(box, got_boxes[i], atol=1e-3)

"""YOLACT: real-time instance segmentation via prototype masks (parity:
mmdet detectors/yolact.py + dense_heads/yolact_head.py [YOLACTHead,
YOLACTSegmHead, YOLACTProtonet] + configs/yolact/yolact_r50_1x8_coco.py,
mask AP 29.0 @ R50-550).

Anchor head (RetinaNet-style, 1 shared conv) predicts class, box deltas,
and K=32 tanh mask COEFFICIENTS per anchor; a protonet FCN on P3 emits K
prototype masks at 1/4 resolution; an instance's mask is the sigmoid of
the coefficient-weighted prototype sum, cropped to its box. Aux semantic
head (1x1 conv on P3) regularizes training.

TPU-first redesign of the reference's dynamic-positive-set mask loss
(yolact_head.py:745-814): instead of gathering a per-image variable
number of positives, a FIXED budget of ``mask_budget`` positive anchors
is selected with top-k (deterministic: lowest anchor index first —
the reference trains on ALL positives up to max_masks_to_train=100 and
random-subsamples beyond; padded GT keeps us under budget), and the
crop + BCE runs as one masked dense (Hp, Wp, M) computation. The BCE is
evaluated inside the crop box only; outside it the reference's zeroed
pred against a zero target contributes exactly 0, so the sums agree.

Deviations (documented): anchor strides are the integer FPN strides
(8..128) with grid centers at ``x * stride`` (the reference hardcodes
550/69-style fractional strides for its fixed 550 input); test-time NMS
is this repo's exact batched NMS rather than the reference's fast_nms
approximation (fast NMS suppresses slightly more, -0.1 AP per its paper).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.anchors import base_anchors, bbox2delta, delta2bbox, grid_anchors
from ..core.max_iou_assigner import max_iou_assign
from ..core.postprocess import batched_nms, fast_nms, \
    filter_scores_and_topk
from .fpn import FPN
from .resnet import ResNet

STRIDES = (8, 16, 32, 64, 128)
BASE_SIZES = (8, 16, 32, 64, 128)      # x octave_base_scale 3
OCTAVE_SCALE = 3.0
RATIOS = (0.5, 1.0, 2.0)
NUM_PROTOS = 32
TARGET_STDS = (0.1, 0.1, 0.2, 0.2)
LOSS_MASK_WEIGHT = 6.125


def yolact_anchors(featmap_sizes: Sequence[Tuple[int, int]]) -> jnp.ndarray:
    """(sum HWA, 4); size = 3 * base_sizes[i], ratios 0.5/1/2, 1 scale."""
    per_level = []
    for (h, w), stride, bs in zip(featmap_sizes, STRIDES, BASE_SIZES):
        base = base_anchors(bs, (OCTAVE_SCALE,), RATIOS)
        per_level.append(grid_anchors((h, w), stride, base))
    return jnp.concatenate(per_level, axis=0)


class YOLACTHeadOutputs(NamedTuple):
    cls_scores: Tuple[jnp.ndarray, ...]    # (B, H, W, A*(C+1)) per level
    bbox_preds: Tuple[jnp.ndarray, ...]    # (B, H, W, A*4)
    coeff_preds: Tuple[jnp.ndarray, ...]   # (B, H, W, A*K), tanh


class YOLACTHead(nn.Module):
    """yolact_head.py:89-138: num_head_convs shared convs then parallel
    cls / reg / coeff convs; coefficients squashed with tanh."""
    num_classes: int = 80
    feat_channels: int = 256
    num_head_convs: int = 1
    num_protos: int = NUM_PROTOS

    @nn.compact
    def __call__(self, feats) -> YOLACTHeadOutputs:
        A = len(RATIOS)
        # init parity (yolact_head.py:65-70): Xavier-uniform convs, bias 0
        xav = nn.initializers.xavier_uniform()
        convs = [nn.Conv(self.feat_channels, (3, 3),
                         padding=[(1, 1), (1, 1)], kernel_init=xav,
                         name=f"head_conv{i}")
                 for i in range(self.num_head_convs)]
        conv_cls = nn.Conv(A * (self.num_classes + 1), (3, 3),
                           padding=[(1, 1), (1, 1)], kernel_init=xav,
                           name="conv_cls")
        conv_reg = nn.Conv(A * 4, (3, 3), padding=[(1, 1), (1, 1)],
                           kernel_init=xav, name="conv_reg")
        conv_coeff = nn.Conv(A * self.num_protos, (3, 3),
                             padding=[(1, 1), (1, 1)], kernel_init=xav,
                             name="conv_coeff")
        cls_out, reg_out, coeff_out = [], [], []
        for x in feats:
            for c in convs:
                x = nn.relu(c(x))
            cls_out.append(conv_cls(x))
            reg_out.append(conv_reg(x))
            coeff_out.append(jnp.tanh(conv_coeff(x)))
        return YOLACTHeadOutputs(tuple(cls_out), tuple(reg_out),
                                 tuple(coeff_out))


class Protonet(nn.Module):
    """yolact_head.py:625-660: (256,3)x3 -> x2 bilinear -> (256,3) ->
    (K,1), ReLU after every stage (include_last_relu=True)."""
    num_protos: int = NUM_PROTOS

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                                name=f"proto{i}")(x))
        B, H, W, C = x.shape
        x = nn.relu(jax.image.resize(x, (B, 2 * H, 2 * W, C), "bilinear"))
        x = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                            name="proto4")(x))
        x = nn.relu(nn.Conv(self.num_protos, (1, 1), name="proto5")(x))
        return x                                     # (B, 2H, 2W, K)


class YOLACTOutputs(NamedTuple):
    head: YOLACTHeadOutputs
    protos: jnp.ndarray                 # (B, Hp, Wp, K) at stride 4
    segm_pred: jnp.ndarray              # (B, H3, W3, C) at stride 8


class YOLACT(nn.Module):
    """detectors/yolact.py: R50 + FPN(start 1, on_input, bilinear) +
    anchor head + protonet + segm head, all three heads fed from P3."""
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = -1             # reference trains the stem too
    num_protos: int = NUM_PROTOS

    def setup(self):
        self.backbone = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                               frozen_stages=self.frozen_stages)
        self.neck = FPN(out_channels=256, num_outs=5, start_level=1,
                        add_extra_convs="on_input", upsample="bilinear")
        self.bbox_head = YOLACTHead(num_classes=self.num_classes,
                                    num_protos=self.num_protos)
        self.protonet = Protonet(num_protos=self.num_protos)
        self.segm_conv = nn.Conv(self.num_classes, (1, 1), name="segm")

    def __call__(self, images, img_hw, deterministic: bool = True):
        feats = self.neck(self.backbone(images))
        head = self.bbox_head(feats)
        protos = self.protonet(feats[0])
        segm = self.segm_conv(feats[0])
        return YOLACTOutputs(head, protos, segm)


def _flatten(levels, B, last):
    return jnp.concatenate([x.reshape(B, -1, last) for x in levels], axis=1)


def _crop_mask(hp: int, wp: int, boxes, stride: float = 4.0):
    """(M, Hp, Wp) 1-inside-box masks; boxes in canvas coords
    (yolact crop() with sanitize padding=1, in mask-grid units)."""
    x1 = boxes[:, 0] / stride - 1.0
    y1 = boxes[:, 1] / stride - 1.0
    x2 = boxes[:, 2] / stride + 1.0
    y2 = boxes[:, 3] / stride + 1.0
    ys = jnp.arange(hp, dtype=jnp.float32)
    xs = jnp.arange(wp, dtype=jnp.float32)
    rows = (ys[None, :] >= y1[:, None]) & (ys[None, :] <= y2[:, None])
    cols = (xs[None, :] >= x1[:, None]) & (xs[None, :] <= x2[:, None])
    return (rows[:, :, None] & cols[:, None, :]).astype(jnp.float32)


class YOLACTLossConfig(NamedTuple):
    num_classes: int = 80
    neg_pos_ratio: int = 3
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    loss_bbox_weight: float = 1.5
    mask_budget: int = 32


def yolact_loss(out: YOLACTOutputs, anchors, gt_bboxes, gt_labels,
                gt_valid, gt_masks, canvas_hw, cfg: YOLACTLossConfig,
                img_hw=None):
    """OHEM softmax CE (3:1) + smooth L1 (1.5) + cropped prototype BCE
    (6.125, box-area normalized) + aux semantic BCE
    (yolact_head.py loss / loss_single_OHEM / YOLACTProtonet.loss /
    YOLACTSegmHead.loss)."""
    B = out.head.cls_scores[0].shape[0]
    C = cfg.num_classes
    cls_flat = _flatten(out.head.cls_scores, B, C + 1)
    deltas = _flatten(out.head.bbox_preds, B, 4)
    coeffs = _flatten(out.head.coeff_preds, B, out.protos.shape[-1])
    N = anchors.shape[0]
    G = gt_bboxes.shape[1]

    assign = jax.vmap(
        lambda b, l, v: max_iou_assign(
            anchors, b, l, v, C, pos_iou_thr=cfg.pos_iou_thr,
            neg_iou_thr=cfg.neg_iou_thr, min_pos_iou=0.0))(
        gt_bboxes, gt_labels, gt_valid)
    pos = assign.assigned_gt >= 0                          # (B, N)
    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

    ce = L.cross_entropy_loss(cls_flat.reshape(-1, C + 1),
                              assign.labels.reshape(-1),
                              reduction="none").reshape(B, N)
    neg = assign.assigned_gt == -1
    neg_rank = jnp.argsort(jnp.argsort(
        jnp.where(neg, -ce, jnp.inf), axis=1), axis=1)
    num_neg = jnp.minimum(cfg.neg_pos_ratio * pos.sum(axis=1),
                          neg.sum(axis=1))
    keep_neg = neg & (neg_rank < num_neg[:, None])
    w = (pos | keep_neg).astype(jnp.float32)
    loss_cls = (ce * w).sum() / num_pos

    tgt = jnp.take_along_axis(
        gt_bboxes, jnp.clip(assign.assigned_gt, 0, G - 1)[..., None],
        axis=1)
    delta_tgt = bbox2delta(anchors[None], tgt, stds=TARGET_STDS)
    loss_bbox = cfg.loss_bbox_weight * L.smooth_l1_loss(
        deltas.reshape(-1, 4), delta_tgt.reshape(-1, 4), beta=1.0,
        weight=pos.astype(jnp.float32).reshape(-1, 1), avg_factor=num_pos)

    # ---- prototype mask loss over a fixed positive budget -------------
    M = cfg.mask_budget
    Hp, Wp = out.protos.shape[1:3]
    Hc, Wc = canvas_hw

    if img_hw is None:
        img_hw = jnp.tile(jnp.asarray([[Hc, Wc]], jnp.float32), (B, 1))

    def per_image(protos, coeff, assigned, gtb, gm, hw):
        score = (assigned >= 0).astype(jnp.float32) \
            - jnp.arange(N, dtype=jnp.float32) / (N + 1.0)
        _, sel = jax.lax.top_k(score, M)
        valid = assigned[sel] >= 0                         # (M,)
        g = jnp.clip(assigned[sel], 0, G - 1)
        logits = jnp.einsum("hwk,mk->mhw", protos, coeff[sel])
        boxes = gtb[g]                                     # (M, 4)
        crop = _crop_mask(Hp, Wp, boxes)
        tgt_m = jax.image.resize(
            gm.transpose(1, 2, 0), (Hp, Wp, gm.shape[0]),
            "bilinear").transpose(2, 0, 1)
        tgt_m = (tgt_m > 0.5).astype(jnp.float32)[g]       # (M, Hp, Wp)
        bce = L.binary_cross_entropy_with_logits(logits, tgt_m) * crop
        # box extents normalize by the PER-IMAGE resized shape, not the
        # padded canvas (yolact_head.py:793-800 uses img_meta img_shape)
        h_im = hw[0].astype(boxes.dtype)
        w_im = hw[1].astype(boxes.dtype)
        gw = jnp.clip((boxes[:, 2] - boxes[:, 0]) / w_im, 1e-4)
        gh = jnp.clip((boxes[:, 3] - boxes[:, 1]) / h_im, 1e-4)
        per = bce.mean(axis=(1, 2)) / gw / gh
        return (per * valid).sum(), valid.sum()

    lm, np_ = jax.vmap(per_image)(out.protos, coeffs, assign.assigned_gt,
                                  gt_bboxes, gt_masks,
                                  jnp.asarray(img_hw, jnp.float32))
    total_sel = jnp.maximum(np_.sum().astype(jnp.float32), 1.0)
    loss_mask = LOSS_MASK_WEIGHT * lm.sum() / total_sel

    # ---- aux semantic head (YOLACTSegmHead.loss: sigmoid BCE against
    # per-class unions of downsampled gt masks; avg_factor is
    # num_imgs * H * W — the class dim is SUMMED, yolact_head.py:523-538)
    Hs, Ws = out.segm_pred.shape[1:3]
    gm_s = jax.image.resize(
        gt_masks.transpose(0, 2, 3, 1), (B, Hs, Ws, G), "bilinear")
    gm_s = (gm_s > 0.5).astype(jnp.float32)                # (B, Hs, Ws, G)
    onehot = (jax.nn.one_hot(gt_labels, C)
              * gt_valid[..., None].astype(jnp.float32))   # (B, G, C)
    seg_tgt = jnp.clip(jnp.einsum("bhwg,bgc->bhwc", gm_s, onehot), 0, 1)
    loss_segm = L.binary_cross_entropy_with_logits(
        out.segm_pred, seg_tgt).sum() / (B * Hs * Ws)
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                loss_mask=loss_mask, loss_segm=loss_segm)


def yolact_decode(out: YOLACTOutputs, anchors, img_hw,
                  num_classes: int, score_thr: float = 0.05,
                  nms_iou: float = 0.5, nms_pre: int = 200,
                  max_per_img: int = 100):
    """yolact_head.get_bboxes + YOLACTProtonet test forward: softmax
    scores (background dropped), delta decode, NMS, then prototype masks
    cropped to the detected boxes and resampled to the shared 28x28
    box-local grid (masks28) for the COCO segm pipeline."""
    from ..ops.roi_align import roi_align
    B = out.head.cls_scores[0].shape[0]
    C = num_classes
    cls_flat = _flatten(out.head.cls_scores, B, C + 1)
    deltas = _flatten(out.head.bbox_preds, B, 4)
    coeffs = _flatten(out.head.coeff_preds, B, out.protos.shape[-1])

    def per_image(cls_s, delta, coeff, protos, hw):
        probs = jax.nn.softmax(cls_s, -1)[:, :C]
        boxes = delta2bbox(anchors, delta, stds=TARGET_STDS)
        h, w = hw[0].astype(boxes.dtype), hw[1].astype(boxes.dtype)
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, w), jnp.clip(boxes[:, 1], 0, h),
            jnp.clip(boxes[:, 2], 0, w), jnp.clip(boxes[:, 3], 0, h)], -1)
        # the reference's Fast NMS (test_cfg top_k=200, iou_thr=0.5):
        # one (C, k, k) matrix pass, no sequential suppression loop — it
        # runs over ALL decoded anchors rather than an nms_pre pre-filter
        # (a strict superset of the reference's candidate set)
        nb, ns, nl, sel_coeff, keep = fast_nms(
            boxes, probs, score_thr, nms_iou, top_k=200,
            max_out=max_per_img, coeffs=coeff)
        m = jax.nn.sigmoid(
            jnp.einsum("hwk,rk->rhw", protos, sel_coeff))
        crop = _crop_mask(protos.shape[0], protos.shape[1], nb)
        m = m * crop
        m28 = jax.vmap(lambda mm, bb: roi_align(
            mm[..., None], bb[None], out_size=28,
            spatial_scale=0.25)[0, :, :, 0])(m, nb)
        return nb, ns, nl, keep, m28

    nb, ns, nl, keep, m28 = jax.vmap(per_image)(
        cls_flat, deltas, coeffs, out.protos, img_hw)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=keep, masks28=m28)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return YOLACT(num_classes=m.num_classes, depth=m.depth,
                      frozen_stages=m.frozen_stages)

    def losses(model, cfg, **_):
        det_cfg = YOLACTLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw)
            sizes = [tuple(c.shape[1:3]) for c in out.head.cls_scores]
            anchors = yolact_anchors(sizes)
            return yolact_loss(
                out, anchors, batch.gt_bboxes, batch.gt_labels,
                batch.gt_valid, batch.gt_masks,
                canvas_hw=tuple(batch.images.shape[1:3]),
                cfg=det_cfg, img_hw=batch.img_hw), None
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import DetM

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            sizes = [tuple(c.shape[1:3]) for c in out.head.cls_scores]
            anchors = yolact_anchors(sizes)
            d = yolact_decode(out, anchors, img_hw,
                              num_classes=model.num_classes,
                              score_thr=max(score_thr, 0.05),
                              max_per_img=max_per_img)
            return DetM(d["bboxes"] / scale_factors[:, None, :],
                        d["scores"], d["labels"], d["valid"],
                        d["masks28"])
        return step

    register_family("yolact", build=build, losses=losses,
                    eval_step=eval_step, with_mask=True)


_register()

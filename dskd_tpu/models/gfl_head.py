"""GFL head (FPN, anchor-free) — forward, loss, box decoding.

Parity target: mmdet/models/dense_heads/gfl_head.py (the GFL R50-FPN 1x
baseline, box AP 40.2): 4 GN conv stacks for cls/reg, per-level learnable
Scale on the reg output, canonical softmax Integral over reg_max+1 bins,
ATSS assignment, QFL(labels, IoU) with global-pos avg factor, GIoU + DFL
weighted by the detached max class score and normalized by the global
weight sum (gfl_head.py:220-300, :330-378).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.anchors import base_anchors, grid_anchors
from ..core.atss import atss_assign
from ..core.boxes import bbox2distance, bbox_overlaps, distance2bbox
from ..core.integral import integral
from ..core.postprocess import batched_nms, filter_scores_and_topk, \
    filter_scores_and_topk_mlvl


class GFLHeadOutputs(NamedTuple):
    cls_scores: Tuple[jnp.ndarray, ...]   # per level (B, H, W, C)
    bbox_preds: Tuple[jnp.ndarray, ...]   # per level (B, H, W, 4*(rm+1))


class Scale(nn.Module):
    init: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.constant(self.init), ())
        return x * s


class GFLHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    reg_max: int = 16
    num_levels: int = 5

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> GFLHeadOutputs:
        # conv towers shared across levels: instantiate modules once,
        # apply per level
        towers = {}
        for prefix in ("cls", "reg"):
            layers = []
            for i in range(self.stacked_convs):
                layers.append((
                    nn.Conv(self.feat_channels, (3, 3),
                            padding=[(1, 1), (1, 1)], use_bias=False,
                            kernel_init=nn.initializers.normal(0.01),
                            name=f"{prefix}_conv{i}"),
                    nn.GroupNorm(epsilon=1e-5, num_groups=32, name=f"{prefix}_gn{i}")))
            towers[prefix] = layers

        def tower(prefix, x):
            for conv, gn in towers[prefix]:
                x = nn.relu(gn(conv(x)))
            return x

        cls_out = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                          kernel_init=nn.initializers.normal(0.01),
                          bias_init=nn.initializers.constant(-4.595),
                          name="gfl_cls")
        reg_out = nn.Conv(4 * (self.reg_max + 1), (3, 3),
                          padding=[(1, 1), (1, 1)],
                          kernel_init=nn.initializers.normal(0.01),
                          name="gfl_reg")
        scales = [Scale(name=f"scale{lvl}") for lvl in range(len(feats))]

        cls_scores, bbox_preds = [], []
        for lvl, x in enumerate(feats):
            cls_scores.append(cls_out(tower("cls", x)))
            bbox_preds.append(scales[lvl](reg_out(tower("reg", x))))
        return GFLHeadOutputs(tuple(cls_scores), tuple(bbox_preds))


def gfl_anchors(featmap_sizes, strides=(8, 16, 32, 64, 128),
                octave_base_scale: int = 8):
    """Single square anchor per position, size octave_base_scale*stride."""
    per_level = []
    for (h, w), s in zip(featmap_sizes, strides):
        base = base_anchors(s * octave_base_scale, scales=(1.0,),
                            ratios=(1.0,))
        per_level.append(grid_anchors((h, w), s, base))
    return per_level


class GFLLossConfig(NamedTuple):
    num_classes: int = 80
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 2.0
    loss_dfl_weight: float = 0.25
    atss_topk: int = 9


def gfl_detection_loss(out: GFLHeadOutputs, gt_bboxes, gt_labels, gt_valid,
                       cfg: GFLLossConfig) -> Dict[str, jnp.ndarray]:
    """Batched multi-level GFL loss under static shapes."""
    B = out.cls_scores[0].shape[0]
    C = cfg.num_classes
    n_bins = cfg.reg_max + 1
    featmap_sizes = [c.shape[1:3] for c in out.cls_scores]
    anchors_per_level = gfl_anchors(featmap_sizes, cfg.strides)
    num_level_anchors = [a.shape[0] for a in anchors_per_level]
    anchors = jnp.concatenate(anchors_per_level, 0)          # (N, 4)

    assign = jax.vmap(lambda b, l, v: atss_assign(
        anchors, num_level_anchors, b, l, v, C, cfg.atss_topk))(
        gt_bboxes, gt_labels, gt_valid)

    num_total_pos = jnp.maximum(
        assign.pos_mask.sum().astype(jnp.float32), 1.0)

    G = gt_bboxes.shape[1]
    safe = jnp.clip(assign.assigned_gt, 0, G - 1)
    tgt_boxes = jnp.take_along_axis(gt_bboxes, safe[..., None], axis=1)

    # per-level strides broadcast to anchors
    stride_per_anchor = jnp.concatenate([
        jnp.full((n,), s, jnp.float32)
        for n, s in zip(num_level_anchors, cfg.strides)])

    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], 1)    # (B, N, C)
    reg_flat = jnp.concatenate(
        [r.reshape(B, -1, 4 * n_bins) for r in out.bbox_preds], 1)

    centers = jnp.stack([(anchors[:, 0] + anchors[:, 2]) / 2,
                         (anchors[:, 1] + anchors[:, 3]) / 2], -1)
    centers_s = centers[None] / stride_per_anchor[None, :, None]
    dists = integral(reg_flat, cfg.reg_max)                  # (B, N, 4)
    decoded_s = distance2bbox(centers_s, dists)              # stride units
    tgt_s = tgt_boxes / stride_per_anchor[None, :, None]

    pos = assign.pos_mask
    posf = pos.astype(jnp.float32)
    # weight = detached max class prob at positives
    w_cls = jax.lax.stop_gradient(
        jax.nn.sigmoid(cls_flat).max(-1)) * posf             # (B, N)
    score = jnp.where(pos, bbox_overlaps(
        jax.lax.stop_gradient(decoded_s), tgt_s, is_aligned=True), 0.0)

    loss_cls = cfg.loss_cls_weight * L.quality_focal_loss(
        cls_flat.reshape(-1, C),
        (assign.labels.reshape(-1), score.reshape(-1)),
        weight=jnp.ones((B * anchors.shape[0],), jnp.float32),
        avg_factor=num_total_pos)

    avg_w = jnp.maximum(w_cls.sum(), 1.0)
    loss_bbox = cfg.loss_bbox_weight * L.giou_loss(
        decoded_s.reshape(-1, 4), tgt_s.reshape(-1, 4),
        weight=w_cls.reshape(-1), avg_factor=avg_w)

    # reference: dfl averaged by 4.0 inside loss_single, then the summed
    # per-level losses divide by the global weight sum (gfl_head.py:373-377)
    target_corners = bbox2distance(centers_s, tgt_s,
                                   max_dis=cfg.reg_max).reshape(-1)
    pred_corners = reg_flat.reshape(-1, n_bins)
    w_dfl = jnp.repeat(w_cls.reshape(-1), 4)
    loss_dfl = cfg.loss_dfl_weight * L.distribution_focal_loss(
        pred_corners, target_corners, weight=w_dfl,
        avg_factor=4.0) / avg_w

    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox, loss_dfl=loss_dfl)


def gfl_get_bboxes(out: GFLHeadOutputs, img_hw, scale_factor=None,
                   reg_max: int = 16, strides=(8, 16, 32, 64, 128),
                   score_thr: float = 0.05, nms_pre: int = 1000,
                   nms_iou: float = 0.6, max_per_img: int = 100,
                   rescale: bool = False):
    """Multi-level decode + class-aware NMS, static shapes."""
    B = out.cls_scores[0].shape[0]
    C = out.cls_scores[0].shape[-1]
    featmap_sizes = [c.shape[1:3] for c in out.cls_scores]
    anchors_per_level = gfl_anchors(featmap_sizes, strides)

    all_scores, all_boxes = [], []
    for lvl, (cls_s, reg_s) in enumerate(zip(out.cls_scores,
                                             out.bbox_preds)):
        a = anchors_per_level[lvl]
        s = strides[lvl]
        centers = jnp.stack([(a[:, 0] + a[:, 2]) / 2,
                             (a[:, 1] + a[:, 3]) / 2], -1)
        dist = integral(reg_s.reshape(B, -1, 4 * (reg_max + 1)),
                        reg_max) * s
        boxes = distance2bbox(centers[None], dist)
        all_scores.append(jax.nn.sigmoid(cls_s.reshape(B, -1, C)))
        all_boxes.append(boxes)
    scores = jnp.concatenate(all_scores, 1)
    boxes = jnp.concatenate(all_boxes, 1)

    level_sizes = [c.shape[1] * c.shape[2] for c in out.cls_scores]

    def per_image(sc, bx, hw, sf):
        # nms_pre applies PER LEVEL (the reference's
        # _get_bboxes_single loops levels)
        top = filter_scores_and_topk_mlvl(sc, score_thr,
                                          nms_pre, level_sizes)
        b = bx[top.keep_idxs]
        h, w = hw[0].astype(b.dtype), hw[1].astype(b.dtype)
        b = jnp.stack([jnp.clip(b[:, 0], 0, w), jnp.clip(b[:, 1], 0, h),
                       jnp.clip(b[:, 2], 0, w), jnp.clip(b[:, 3], 0, h)], -1)
        nb, ns, nl, keep, src = batched_nms(b, top.scores, top.labels,
                                            nms_iou, max_per_img,
                                            valid=top.valid)
        if rescale and sf is not None:
            nb = nb / sf[None]
        return nb, ns, nl, keep, top.keep_idxs[src]

    if scale_factor is None:
        scale_factor = jnp.ones((B, 4), jnp.float32)
    nb, ns, nl, keep, qid = jax.vmap(per_image)(scores, boxes, img_hw,
                                                scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=keep, keep_qid=qid)

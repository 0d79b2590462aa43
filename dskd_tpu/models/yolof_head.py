"""YOLOF head: forward, detection loss, box decoding + distill hooks.

Parity target: mmdet/models/dense_heads/yolof_head.py (fork-modified):
  * forward (:150-182): cls subnet (2x conv+BN+ReLU) -> A*C scores; reg
    subnet (4x conv+BN+ReLU) -> A*4 deltas + A implicit objectness; the
    normalized score is cls + obj - log(1 + exp(cls) + exp(obj));
  * loss (:267-400): UniformAssigner targets, FocalLoss cls over all anchors
    with ignore weights, GIoU on the (2k x G) positive candidates, hard
    teacher-merge, soft-KD / ld-bbox / kldv distills keyed on the teacher's
    kept anchor positions;
  * get_bboxes: score threshold + topk + class-aware NMS (static here).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core import losses as L
from ..core.anchors import base_anchors, bbox2delta, delta2bbox, grid_anchors
from ..core.postprocess import batched_nms, filter_scores_and_topk
from ..core.uniform_assigner import uniform_assign
from .dilated_encoder import TrainableBatchNorm

INF = 1e8


class YOLOFHeadOutputs(NamedTuple):
    cls_scores: jnp.ndarray   # (B, H, W, A*C) normalized logits
    bbox_preds: jnp.ndarray   # (B, H, W, A*4) deltas
    feat_hw: Tuple[int, int]


class YOLOFHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 512
    num_cls_convs: int = 2
    num_reg_convs: int = 4
    num_anchors: int = 5

    @nn.compact
    def __call__(self, feat: jnp.ndarray,
                 train: bool = False) -> YOLOFHeadOutputs:
        A, C = self.num_anchors, self.num_classes
        x = feat
        for i in range(self.num_cls_convs):
            x = nn.Conv(self.in_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        kernel_init=nn.initializers.normal(0.01),
                        use_bias=False, name=f"cls_conv{i}")(x)
            x = nn.relu(TrainableBatchNorm(name=f"cls_bn{i}")(x, train))
        cls_score = nn.Conv(
            A * C, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(
                -math.log((1 - 0.01) / 0.01)),
            name="cls_score")(x)

        y = feat
        for i in range(self.num_reg_convs):
            y = nn.Conv(self.in_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        kernel_init=nn.initializers.normal(0.01),
                        use_bias=False, name=f"reg_conv{i}")(y)
            y = nn.relu(TrainableBatchNorm(name=f"reg_bn{i}")(y, train))
        bbox_pred = nn.Conv(A * 4, (3, 3), padding=[(1, 1), (1, 1)],
                            kernel_init=nn.initializers.normal(0.01),
                            name="bbox_pred")(y)
        objectness = nn.Conv(A, (3, 3), padding=[(1, 1), (1, 1)],
                             kernel_init=nn.initializers.normal(0.01),
                             name="object_pred")(y)

        B, H, W, _ = cls_score.shape
        cls = cls_score.reshape(B, H, W, A, C)
        obj = objectness.reshape(B, H, W, A, 1)
        normalized = cls + obj - jnp.log(
            1.0 + jnp.clip(jnp.exp(cls), None, INF)
            + jnp.clip(jnp.exp(obj), None, INF))
        return YOLOFHeadOutputs(normalized.reshape(B, H, W, A * C),
                                bbox_pred, (H, W))


def yolof_anchors(feat_hw: Tuple[int, int], stride: int = 32,
                  scales=(1, 2, 4, 8, 16)) -> jnp.ndarray:
    base = base_anchors(stride, scales, ratios=(1.0,))
    return grid_anchors(feat_hw, stride, base)         # (HWA, 4)


class YOLOFLossConfig(NamedTuple):
    num_classes: int = 80
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.0
    match_times: int = 4
    pos_ignore_thr: float = 0.15
    neg_ignore_thr: float = 0.7
    ctr_clamp: float = 32.0


def yolof_detection_loss(out: YOLOFHeadOutputs, anchors, gt_bboxes,
                         gt_labels, gt_valid, cfg: YOLOFLossConfig):
    """Batched YOLOF loss. Returns (loss dict, aux with per-image assigns).

    anchors: (HWA, 4). gt_*: (B, G, ...) padded.
    """
    B = out.cls_scores.shape[0]
    C = cfg.num_classes
    cls_flat = out.cls_scores.reshape(B, -1, C)          # (B, HWA, C)
    deltas = out.bbox_preds.reshape(B, -1, 4)            # (B, HWA, 4)
    decoded = delta2bbox(anchors[None], deltas, add_ctr_clamp=True,
                         ctr_clamp=cfg.ctr_clamp)        # (B, HWA, 4)

    assign = jax.vmap(
        lambda d, b, l, v: uniform_assign(
            d, anchors, b, l, v, C, cfg.match_times, cfg.pos_ignore_thr,
            cfg.neg_ignore_thr))(decoded, gt_bboxes, gt_labels, gt_valid)

    # reference: num_total_pos = sum(max(pos_i, 1)); avg = mean over replicas
    num_total_pos = jnp.maximum(assign.num_pos, 1).sum().astype(jnp.float32)
    num_total_samples = jnp.maximum(num_total_pos / 1.0, 1.0)

    labels = assign.labels.reshape(-1)
    weights = assign.label_weights.reshape(-1)
    onehot = jax.nn.one_hot(jnp.clip(labels, 0, C), C + 1)[:, :C]
    loss_cls = cfg.loss_cls_weight * L.sigmoid_focal_loss(
        cls_flat.reshape(-1, C), onehot, weight=weights[:, None],
        avg_factor=num_total_samples, gamma=cfg.focal_gamma,
        alpha=cfg.focal_alpha)

    # bbox loss on the (2kG,) candidates per image
    cand_boxes = jnp.take_along_axis(
        decoded, assign.cand_anchor_idx[..., None], axis=1)   # (B, 2kG, 4)
    G = gt_bboxes.shape[1]
    tgt_boxes = jnp.take_along_axis(
        gt_bboxes, jnp.clip(assign.cand_gt_idx, 0, G - 1)[..., None],
        axis=1)
    w = assign.cand_pos_mask.astype(jnp.float32)
    loss_bbox = cfg.loss_bbox_weight * L.giou_loss(
        cand_boxes.reshape(-1, 4), tgt_boxes.reshape(-1, 4),
        weight=w.reshape(-1), avg_factor=num_total_samples)

    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox), assign


def yolof_get_bboxes(out: YOLOFHeadOutputs, anchors, img_hw,
                     scale_factor=None, score_thr: float = 0.05,
                     nms_iou: float = 0.6, nms_pre: int = 1000,
                     max_per_img: int = 100, ctr_clamp: float = 32.0,
                     rescale: bool = False):
    """Static-shape YOLOF box decoding with class-aware NMS.

    Returns a dict with (B, max_per_img) bboxes/scores/labels/keep_qid/valid
    where keep_qid indexes the flattened (HWA) anchor axis (the reference's
    teacher pred_keepid, yolof_head.py:827-923)."""
    B = out.cls_scores.shape[0]
    num_classes = out.cls_scores.reshape(B, -1).shape[-1] // anchors.shape[0]
    cls_flat = out.cls_scores.reshape(B, anchors.shape[0], num_classes)
    deltas = out.bbox_preds.reshape(B, -1, 4)

    def per_image(cls_s, delta, hw, sf):
        probs = jax.nn.sigmoid(cls_s)
        top = filter_scores_and_topk(probs, score_thr, nms_pre)
        sel_anchors = anchors[top.keep_idxs]
        sel_deltas = delta[top.keep_idxs]
        boxes = delta2bbox(sel_anchors, sel_deltas, add_ctr_clamp=True,
                           ctr_clamp=ctr_clamp)
        h, w = hw[0].astype(boxes.dtype), hw[1].astype(boxes.dtype)
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, w), jnp.clip(boxes[:, 1], 0, h),
            jnp.clip(boxes[:, 2], 0, w), jnp.clip(boxes[:, 3], 0, h)], -1)
        nb, ns, nl, keep, src = batched_nms(boxes, top.scores, top.labels,
                                            nms_iou, max_per_img,
                                            valid=top.valid)
        if rescale and sf is not None:
            nb = nb / sf[None]
        qid = top.keep_idxs[src]     # exact anchor-position ids of survivors
        return nb, ns, nl, keep, qid

    if scale_factor is None:
        scale_factor = jnp.ones((B, 4), jnp.float32)
    nb, ns, nl, keep, qid = jax.vmap(per_image)(
        cls_flat, deltas, img_hw, scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=keep, keep_qid=qid)

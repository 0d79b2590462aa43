"""YOLOY head (parity: the fork's yoloy_head.py — a YOLOX-style decoupled
head with IL distill knobs).

Forward (:215-244): per level, shared decoupled towers (2 conv stacks,
Swish/BN) -> cls (C), reg (4: xy offset + log-wh), obj (1). Decoding
(:338-349): xy = (pred_xy * stride + prior_center), wh = exp(pred_wh) *
stride. Loss (:365-451): SimOTA on detached sigmoid(cls)*sigmoid(obj),
IoU-aware one-hot cls targets, obj BCE over all priors, DIoU bbox loss
(fork config), optional L1, all summed / total positives.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.postprocess import batched_nms, filter_scores_and_topk
from ..core.sim_ota import sim_ota_assign
from .yoloy_pafpn import ConvBNSwish


class YOLOYHeadOutputs(NamedTuple):
    cls_scores: Tuple[jnp.ndarray, ...]   # per level (B, H, W, C)
    bbox_preds: Tuple[jnp.ndarray, ...]   # per level (B, H, W, 4)
    objectnesses: Tuple[jnp.ndarray, ...]  # per level (B, H, W, 1)


class YOLOYHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 128
    feat_channels: int = 128
    stacked_convs: int = 2
    num_levels: int = 3

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray],
                 train: bool = False) -> YOLOYHeadOutputs:
        # towers shared across levels (YOLOX uses per-level towers; the fork
        # keeps per-level ModuleLists too — build per-level modules)
        cls_scores, bbox_preds, objectnesses = [], [], []
        for lvl, x in enumerate(feats):
            c = x
            r = x
            for i in range(self.stacked_convs):
                c = ConvBNSwish(self.feat_channels, 3,
                                name=f"cls_conv{lvl}_{i}")(c, train)
                r = ConvBNSwish(self.feat_channels, 3,
                                name=f"reg_conv{lvl}_{i}")(r, train)
            cls_scores.append(nn.Conv(
                self.num_classes, (1, 1),
                bias_init=nn.initializers.constant(-4.595),
                name=f"conv_cls{lvl}")(c))
            bbox_preds.append(nn.Conv(4, (1, 1),
                                      name=f"conv_reg{lvl}")(r))
            objectnesses.append(nn.Conv(
                1, (1, 1), bias_init=nn.initializers.constant(-4.595),
                name=f"conv_obj{lvl}")(r))
        return YOLOYHeadOutputs(tuple(cls_scores), tuple(bbox_preds),
                                tuple(objectnesses))


def yoloy_priors(featmap_sizes, strides=(8, 16, 32)):
    """(N, 4) [cx, cy, stride, stride] with 0 offset (MlvlPointGenerator)."""
    out = []
    for (h, w), s in zip(featmap_sizes, strides):
        xs = (jnp.arange(w, dtype=jnp.float32)) * s
        ys = (jnp.arange(h, dtype=jnp.float32)) * s
        gx = jnp.tile(xs[None, :], (h, 1)).reshape(-1)
        gy = jnp.tile(ys[:, None], (1, w)).reshape(-1)
        out.append(jnp.stack([gx, gy, jnp.full_like(gx, s),
                              jnp.full_like(gx, s)], -1))
    return jnp.concatenate(out, 0)


def yoloy_decode(priors, bbox_preds):
    """(N, 4) priors + (..., N, 4) preds -> xyxy (reference :338-349)."""
    xys = bbox_preds[..., :2] * priors[..., 2:] + priors[..., :2]
    whs = jnp.exp(bbox_preds[..., 2:]) * priors[..., 2:]
    x1y1 = xys - whs / 2
    x2y2 = xys + whs / 2
    return jnp.concatenate([x1y1, x2y2], axis=-1)


class YOLOYLossConfig(NamedTuple):
    num_classes: int = 80
    strides: Tuple[int, ...] = (8, 16, 32)
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 5.0
    loss_obj_weight: float = 1.0
    loss_l1_weight: float = 1.0
    use_l1: bool = False
    bbox_loss: str = "diou"     # fork config uses DIoULoss


def yoloy_detection_loss(out: YOLOYHeadOutputs, gt_bboxes, gt_labels,
                         gt_valid, cfg: YOLOYLossConfig
                         ) -> Dict[str, jnp.ndarray]:
    B = out.cls_scores[0].shape[0]
    C = cfg.num_classes
    featmap_sizes = [c.shape[1:3] for c in out.cls_scores]
    priors = yoloy_priors(featmap_sizes, cfg.strides)       # (N, 4)
    N = priors.shape[0]

    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], 1)
    reg_flat = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], 1)
    obj_flat = jnp.concatenate(
        [o.reshape(B, -1) for o in out.objectnesses], 1)
    decoded = yoloy_decode(priors[None], reg_flat)          # (B, N, 4)

    # assignment priors use the 0.5-stride center offset (reference :487)
    offset_priors = jnp.concatenate(
        [priors[:, :2] + priors[:, 2:] * 0.5, priors[:, 2:]], -1)
    scores = jax.lax.stop_gradient(
        jax.nn.sigmoid(cls_flat) * jax.nn.sigmoid(obj_flat)[..., None])

    assign = jax.vmap(lambda s, d, b, l, v: sim_ota_assign(
        s, offset_priors, d, b, l, v, C))(
        scores, jax.lax.stop_gradient(decoded), gt_bboxes, gt_labels,
        gt_valid)

    num_total = jnp.maximum(assign.num_pos.sum().astype(jnp.float32), 1.0)

    G = gt_bboxes.shape[1]
    safe = jnp.clip(assign.assigned_gt, 0, G - 1)
    tgt_boxes = jnp.take_along_axis(gt_bboxes, safe[..., None], axis=1)
    posf = assign.pos_mask.astype(jnp.float32)

    bbox_fn = {"diou": L.diou_loss, "ciou": L.ciou_loss,
               "square_iou": L.square_iou_loss}.get(cfg.bbox_loss,
                                                    L.iou_loss)
    loss_bbox = cfg.loss_bbox_weight * bbox_fn(
        decoded.reshape(-1, 4), tgt_boxes.reshape(-1, 4),
        weight=posf.reshape(-1), reduction="none").sum() / num_total

    # obj BCE over all priors, target 1 at positives
    loss_obj = cfg.loss_obj_weight * L.binary_cross_entropy_with_logits(
        obj_flat, posf).sum() / num_total

    # IoU-aware one-hot cls targets at positives
    onehot = jax.nn.one_hot(
        jnp.clip(assign.labels, 0, C), C + 1)[..., :C]      # (B, N, C)
    cls_tgt = onehot * assign.max_ious[..., None]
    cls_bce = L.binary_cross_entropy_with_logits(cls_flat, cls_tgt)
    loss_cls = cfg.loss_cls_weight * (
        cls_bce * posf[..., None]).sum() / num_total

    losses = dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                  loss_obj=loss_obj)
    if cfg.use_l1:
        gt_cxcywh = jnp.concatenate(
            [(tgt_boxes[..., :2] + tgt_boxes[..., 2:]) / 2,
             tgt_boxes[..., 2:] - tgt_boxes[..., :2]], -1)
        l1_tgt_xy = (gt_cxcywh[..., :2] - priors[None, :, :2]) / priors[None, :, 2:]
        l1_tgt_wh = jnp.log(jnp.clip(gt_cxcywh[..., 2:], 1e-8, None)
                            / priors[None, :, 2:] + 1e-8)
        l1_tgt = jnp.concatenate([l1_tgt_xy, l1_tgt_wh], -1)
        losses["loss_l1"] = cfg.loss_l1_weight * (
            jnp.abs(reg_flat - l1_tgt)
            * posf[..., None]).sum() / num_total
    return losses


def yoloy_get_bboxes(out: YOLOYHeadOutputs, img_hw, scale_factor=None,
                     strides=(8, 16, 32), score_thr: float = 0.01,
                     nms_iou: float = 0.65, nms_pre: int = 2000,
                     max_per_img: int = 100, rescale: bool = False):
    """Static YOLOX-style decode + NMS. Scores = sigmoid(cls)*sigmoid(obj)."""
    B = out.cls_scores[0].shape[0]
    C = out.cls_scores[0].shape[-1]
    featmap_sizes = [c.shape[1:3] for c in out.cls_scores]
    priors = yoloy_priors(featmap_sizes, strides)

    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], 1)
    reg_flat = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], 1)
    obj_flat = jnp.concatenate(
        [o.reshape(B, -1) for o in out.objectnesses], 1)
    scores = jax.nn.sigmoid(cls_flat) * jax.nn.sigmoid(obj_flat)[..., None]
    boxes = yoloy_decode(priors[None], reg_flat)

    def per_image(sc, bx, hw, sf):
        top = filter_scores_and_topk(sc, score_thr, nms_pre)
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

"""ATSS detector (parity: mmdet dense_heads/atss_head.py +
detectors/atss.py, configs/atss/atss_r50_fpn_1x_coco.py).

RetinaNet-style shared conv stacks but ONE anchor per cell (scale 8),
a centerness branch, adaptive training sample selection (core/atss.py),
focal cls + centerness-weighted GIoU + centerness BCE — the bridge
design between anchor-based and anchor-free heads.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.anchors import base_anchors, bbox2delta, delta2bbox, grid_anchors
from ..core.atss import atss_assign
from ..core.postprocess import batched_nms, filter_scores_and_topk, \
    filter_scores_and_topk_mlvl
from .fcos import Scale
from .fpn import FPN
from .gfl_detr_head import bias_init_with_prob
from .resnet import ResNet

STRIDES = (8, 16, 32, 64, 128)
ANCHOR_SCALE = 8
# DeltaXYWHBBoxCoder target_stds of the reference ATSS config
DELTA_STDS = (0.1, 0.1, 0.2, 0.2)


class ATSSHeadOutputs(NamedTuple):
    cls_scores: Tuple[jnp.ndarray, ...]   # (B, H, W, C)
    bbox_preds: Tuple[jnp.ndarray, ...]   # (B, H, W, 4) deltas
    centernesses: Tuple[jnp.ndarray, ...]  # (B, H, W, 1)


class ATSSOutputs(NamedTuple):
    head: ATSSHeadOutputs
    neck_feats: Tuple[jnp.ndarray, ...]


class ATSSHead(nn.Module):
    num_classes: int = 80
    stacked_convs: int = 4
    feat_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> ATSSHeadOutputs:
        # init parity (atss_head.py:36-43): head convs Normal(std=0.01),
        # atss_cls bias at prior prob 0.01
        n01 = nn.initializers.normal(0.01)
        convs = {}
        for i in range(self.stacked_convs):
            convs[f"cls_conv{i}"] = nn.Conv(
                self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                use_bias=False, kernel_init=n01, name=f"cls_conv{i}")
            convs[f"reg_conv{i}"] = nn.Conv(
                self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                use_bias=False, kernel_init=n01, name=f"reg_conv{i}")
            # ConvModule norm_cfg GN(32) between conv and relu
            # (atss_head.py / atss_r50_fpn_1x config), conv bias off
            convs[f"cls_gn{i}"] = nn.GroupNorm(epsilon=1e-5, num_groups=32,
                                               name=f"cls_gn{i}")
            convs[f"reg_gn{i}"] = nn.GroupNorm(epsilon=1e-5, num_groups=32,
                                               name=f"reg_gn{i}")
        atss_cls = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=n01,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="atss_cls")
        atss_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                           kernel_init=n01, name="atss_reg")
        atss_ctr = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                           kernel_init=n01, name="atss_centerness")

        cls_out, reg_out, ctr_out = [], [], []
        for lvl, f in enumerate(feats):
            c = r = f
            for i in range(self.stacked_convs):
                c = nn.relu(convs[f"cls_gn{i}"](convs[f"cls_conv{i}"](c)))
                r = nn.relu(convs[f"reg_gn{i}"](convs[f"reg_conv{i}"](r)))
            cls_out.append(atss_cls(c))
            # per-level learnable Scale on the reg output (atss_head.py
            # self.scales)
            reg_out.append(Scale(name=f"scale{lvl}")(atss_reg(r)))
            ctr_out.append(atss_ctr(r))
        return ATSSHeadOutputs(tuple(cls_out), tuple(reg_out),
                               tuple(ctr_out))


class ATSS(nn.Module):
    """``dyhead_blocks`` > 0 inserts the DyHead attention neck between the
    FPN and the head (configs/dyhead/atss_r50_fpn_dyhead_1x, which also
    drops the head towers: head_stacked_convs=0)."""
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = 1
    dyhead_blocks: int = 0
    head_stacked_convs: int = 4

    @nn.compact
    def __call__(self, images, img_hw, deterministic: bool = True):
        feats = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                       frozen_stages=self.frozen_stages,
                       name="backbone")(images)
        neck = FPN(out_channels=256, num_outs=5, start_level=1,
                   add_extra_convs="on_output",
                   relu_before_extra_convs=True, name="neck")(feats)
        if self.dyhead_blocks > 0:
            from .dyhead import DyHead
            neck = DyHead(out_channels=256, num_blocks=self.dyhead_blocks,
                          name="dyhead")(neck)
        head = ATSSHead(num_classes=self.num_classes,
                        stacked_convs=self.head_stacked_convs,
                        name="bbox_head")(neck)
        return ATSSOutputs(head, neck)


def atss_anchors(featmap_sizes):
    """One scale-8 square anchor per cell; returns (anchors (N, 4),
    per-level counts)."""
    per_level, counts = [], []
    for (h, w), stride in zip(featmap_sizes, STRIDES):
        base = base_anchors(stride, (ANCHOR_SCALE,), (1.0,))
        a = grid_anchors((h, w), stride, base)
        per_level.append(a)
        counts.append(a.shape[0])
    return jnp.concatenate(per_level, axis=0), tuple(counts)


class ATSSLossConfig(NamedTuple):
    num_classes: int = 80
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 2.0
    loss_ctr_weight: float = 1.0
    topk: int = 9


def _centerness_target(anchors, gts):
    """atss_head.centerness_target: sqrt of the l/r and t/b min/max ratios
    from the ANCHOR CENTER to the assigned gt's sides."""
    cx = (anchors[:, 0] + anchors[:, 2]) / 2
    cy = (anchors[:, 1] + anchors[:, 3]) / 2
    l = cx - gts[:, 0]
    t = cy - gts[:, 1]
    r = gts[:, 2] - cx
    b = gts[:, 3] - cy
    lr = jnp.stack([l, r], -1)
    tb = jnp.stack([t, b], -1)
    val = ((lr.min(-1) / jnp.clip(lr.max(-1), 1e-6, None))
           * (tb.min(-1) / jnp.clip(tb.max(-1), 1e-6, None)))
    return jnp.sqrt(jnp.clip(val, 0, None))


def atss_detection_loss(out: ATSSHeadOutputs, anchors, level_counts,
                        gt_bboxes, gt_labels, gt_valid,
                        cfg: ATSSLossConfig):
    B = out.cls_scores[0].shape[0]
    C = cfg.num_classes
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], axis=1)
    deltas = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], axis=1)
    ctr_flat = jnp.concatenate(
        [c.reshape(B, -1) for c in out.centernesses], axis=1)

    assign = jax.vmap(
        lambda b, l, v: atss_assign(anchors, level_counts, b, l, v, C,
                                    topk=cfg.topk))(
        gt_bboxes, gt_labels, gt_valid)
    pos = assign.pos_mask                                   # (B, N)
    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

    onehot = jax.nn.one_hot(assign.labels, C + 1)[..., :C]
    loss_cls = cfg.loss_cls_weight * L.sigmoid_focal_loss(
        cls_flat.reshape(-1, C), onehot.reshape(-1, C),
        avg_factor=num_pos, gamma=cfg.focal_gamma, alpha=cfg.focal_alpha)

    G = gt_bboxes.shape[1]
    tgt = jnp.take_along_axis(
        gt_bboxes, jnp.clip(assign.assigned_gt, 0, G - 1)[..., None],
        axis=1)                                             # (B, N, 4)
    ctr_t = jax.vmap(_centerness_target, in_axes=(None, 0))(anchors, tgt)
    ctr_t = jnp.where(pos, ctr_t, 0.0)

    decoded = delta2bbox(anchors[None], deltas, stds=DELTA_STDS)
    w = (pos.astype(jnp.float32) * ctr_t).reshape(-1)
    loss_bbox = cfg.loss_bbox_weight * L.giou_loss(
        decoded.reshape(-1, 4), tgt.reshape(-1, 4), weight=w,
        avg_factor=jnp.clip(ctr_t.sum(), 1e-6, None))

    loss_ctr = cfg.loss_ctr_weight * L.bce_loss(
        ctr_flat.reshape(-1), ctr_t.reshape(-1),
        weight=pos.astype(jnp.float32).reshape(-1), avg_factor=num_pos)
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                loss_centerness=loss_ctr)


def atss_get_bboxes(out: ATSSHeadOutputs, anchors, img_hw,
                    scale_factor=None, score_thr: float = 0.05,
                    nms_iou: float = 0.6, nms_pre: int = 1000,
                    max_per_img: int = 100, rescale: bool = False):
    B = out.cls_scores[0].shape[0]
    C = out.cls_scores[0].shape[-1]
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], axis=1)
    deltas = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], axis=1)
    ctr_flat = jnp.concatenate(
        [c.reshape(B, -1) for c in out.centernesses], axis=1)

    level_sizes = [c.shape[1] * c.shape[2] * (c.shape[3] // C)
                   for c in out.cls_scores]

    def per_image(cls_s, delta, ctr, hw, sf):
        probs = jax.nn.sigmoid(cls_s) * jax.nn.sigmoid(ctr)[:, None]
        # nms_pre applies PER LEVEL (the reference's
        # _get_bboxes_single loops levels)
        top = filter_scores_and_topk_mlvl(probs, score_thr,
                                          nms_pre, level_sizes)
        boxes = delta2bbox(anchors[top.keep_idxs], delta[top.keep_idxs],
                           stds=DELTA_STDS)
        h, w = hw[0].astype(boxes.dtype), hw[1].astype(boxes.dtype)
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, w), jnp.clip(boxes[:, 1], 0, h),
            jnp.clip(boxes[:, 2], 0, w), jnp.clip(boxes[:, 3], 0, h)], -1)
        nb, ns, nl, keep, _ = batched_nms(boxes, top.scores, top.labels,
                                          nms_iou, max_per_img,
                                          valid=top.valid)
        if rescale and sf is not None:
            nb = nb / sf[None]
        return nb, ns, nl, keep

    if scale_factor is None:
        scale_factor = jnp.ones((B, 4), jnp.float32)
    nb, ns, nl, keep = jax.vmap(per_image)(cls_flat, deltas, ctr_flat,
                                           img_hw, scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=keep)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return ATSS(num_classes=m.num_classes, depth=m.depth,
                    frozen_stages=m.frozen_stages,
                    dyhead_blocks=m.dyhead_blocks,
                    head_stacked_convs=0 if m.dyhead_blocks else 4)

    def losses(model, cfg, **_):
        det_cfg = ATSSLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            anchors, counts = atss_anchors(
                [c.shape[1:3] for c in out.head.cls_scores])
            return atss_detection_loss(
                out.head, anchors, counts, batch.gt_bboxes,
                batch.gt_labels, batch.gt_valid, det_cfg), None
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            anchors, _ = atss_anchors(
                [c.shape[1:3] for c in out.head.cls_scores])
            d = atss_get_bboxes(out.head, anchors, img_hw,
                                scale_factor=scale_factors,
                                score_thr=max(score_thr, 0.05),
                                max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("atss", build=build, losses=losses,
                    eval_step=eval_step)


_register()

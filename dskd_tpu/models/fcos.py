"""FCOS (parity: mmdet dense_heads/fcos_head.py + detectors/fcos.py,
configs/fcos/fcos_r50_caffe_fpn_gn-head_1x_coco.py).

Anchor-free: every feature-map point regresses (l, t, r, b) distances
(exp-scaled per level), classifies with focal loss, and predicts a
centerness that both weights the box loss and rescores at test time.
Targets: a point is positive for the min-area GT that contains it AND
whose max regress distance falls inside the level's regress_range —
the reference's level-assignment rule, vectorized over (points, gts).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core import losses as L
from ..core.boxes import distance2bbox
from ..core.postprocess import batched_nms, filter_scores_and_topk, \
    filter_scores_and_topk_mlvl
from .fpn import FPN
from .gfl_detr_head import bias_init_with_prob
from .resnet import ResNet

STRIDES = (8, 16, 32, 64, 128)
REGRESS_RANGES = ((-1, 64), (64, 128), (128, 256), (256, 512),
                  (512, 1e8))
INF = 1e8


class FCOSHeadOutputs(NamedTuple):
    cls_scores: Tuple[jnp.ndarray, ...]   # (B, H, W, C) per level
    bbox_preds: Tuple[jnp.ndarray, ...]   # (B, H, W, 4) per level (l,t,r,b)
    centernesses: Tuple[jnp.ndarray, ...]  # (B, H, W, 1)


class FCOSOutputs(NamedTuple):
    head: FCOSHeadOutputs
    neck_feats: Tuple[jnp.ndarray, ...]


class Scale(nn.Module):
    """Learnable per-level scalar on the regression output."""
    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.ones, ())
        return x * s


class FCOSHead(nn.Module):
    num_classes: int = 80
    stacked_convs: int = 4
    feat_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> FCOSHeadOutputs:
        # init parity (anchor_free_head.py:66-74): every head conv
        # Normal(std=0.01); conv_cls bias at prior prob 0.01
        n01 = nn.initializers.normal(0.01)
        convs = {}
        for i in range(self.stacked_convs):
            convs[f"cls_conv{i}"] = nn.Conv(
                self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                use_bias=False, kernel_init=n01, name=f"cls_conv{i}")
            convs[f"reg_conv{i}"] = nn.Conv(
                self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                use_bias=False, kernel_init=n01, name=f"reg_conv{i}")
            # the reference's ConvModule norm_cfg: GN(32) between conv and
            # relu (fcos_head.py gn-head config), conv bias absorbed by GN
            convs[f"cls_gn{i}"] = nn.GroupNorm(epsilon=1e-5, num_groups=32,
                                               name=f"cls_gn{i}")
            convs[f"reg_gn{i}"] = nn.GroupNorm(epsilon=1e-5, num_groups=32,
                                               name=f"reg_gn{i}")
        conv_cls = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=n01,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="conv_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                           kernel_init=n01, name="conv_reg")
        conv_ctr = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                           kernel_init=n01, name="conv_centerness")

        cls_out, reg_out, ctr_out = [], [], []
        for lvl, f in enumerate(feats):
            c = r = f
            for i in range(self.stacked_convs):
                c = nn.relu(convs[f"cls_gn{i}"](convs[f"cls_conv{i}"](c)))
                r = nn.relu(convs[f"reg_gn{i}"](convs[f"reg_conv{i}"](r)))
            cls_out.append(conv_cls(c))
            # centerness on the CLS branch: the gn-head 1x config keeps
            # fcos_head.py's centerness_on_reg=False default
            ctr_out.append(conv_ctr(c))
            reg = Scale(name=f"scale{lvl}")(conv_reg(r))
            reg_out.append(jnp.exp(reg))      # positive distances
        return FCOSHeadOutputs(tuple(cls_out), tuple(reg_out),
                               tuple(ctr_out))


class FCOS(nn.Module):
    """``backbone`` spec (models/backbones.py): '' = ResNet(depth);
    'hrnet_w18' mirrors the reference's fcos_hrnetv2p_w18 (HRFPN neck).
    ``nas_fpn=True`` swaps the FPN for the NAS-FCOS searched neck
    (detectors/nasfcos.py pairing)."""
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = 1
    backbone: str = ""
    nas_fpn: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray, img_hw: jnp.ndarray,
                 deterministic: bool = True) -> FCOSOutputs:
        from .backbones import apply_backbone, build_backbone
        bb, kind = build_backbone(self.backbone, self.depth,
                                  self.frozen_stages)
        feats = apply_backbone(bb, self.backbone, images, deterministic)
        if kind == "hr":
            from .hrnet import HRFPN
            neck = HRFPN(out_channels=256, num_outs=5, name="neck")(feats)
        elif self.nas_fpn:
            from .nasfcos_fpn import NASFCOSFPN
            neck = NASFCOSFPN(out_channels=256, num_outs=5,
                              name="neck")(feats[1:], deterministic)
        else:
            neck = FPN(out_channels=256, num_outs=5,
                       start_level=1 if kind == "c2345" else 0,
                       add_extra_convs="on_output",
                       relu_before_extra_convs=True, name="neck")(feats)
        head = FCOSHead(num_classes=self.num_classes,
                        name="bbox_head")(neck)
        return FCOSOutputs(head, neck)


def fcos_points(featmap_sizes: Sequence[Tuple[int, int]]):
    """Flattened all-level point centers (N, 2) + per-point
    (stride, regress_lo, regress_hi) (N, 3)."""
    pts, meta = [], []
    for (h, w), stride, (lo, hi) in zip(featmap_sizes, STRIDES,
                                        REGRESS_RANGES):
        ys, xs = np.mgrid[:h, :w]
        p = np.stack([(xs + 0.5) * stride, (ys + 0.5) * stride],
                     -1).reshape(-1, 2)
        pts.append(p)
        meta.append(np.tile([[stride, lo, min(hi, INF)]], (h * w, 1)))
    return (jnp.asarray(np.concatenate(pts), jnp.float32),
            jnp.asarray(np.concatenate(meta), jnp.float32))


def _fcos_targets(points, meta, gt_bboxes, gt_labels, gt_valid,
                  num_classes):
    """Per-image targets: labels (N,), bbox ltrb targets (N, 4),
    pos mask (N,) — fcos_head._get_target_single vectorized."""
    N = points.shape[0]
    G = gt_bboxes.shape[0]
    xs, ys = points[:, 0:1], points[:, 1:2]                # (N, 1)
    l = xs - gt_bboxes[:, 0][None]                         # (N, G)
    t = ys - gt_bboxes[:, 1][None]
    r = gt_bboxes[:, 2][None] - xs
    b = gt_bboxes[:, 3][None] - ys
    ltrb = jnp.stack([l, t, r, b], -1)                     # (N, G, 4)
    inside = ltrb.min(-1) > 0
    max_dist = ltrb.max(-1)
    in_range = ((max_dist >= meta[:, 1:2])
                & (max_dist <= meta[:, 2:3]))
    ok = inside & in_range & gt_valid[None]
    areas = ((gt_bboxes[:, 2] - gt_bboxes[:, 0])
             * (gt_bboxes[:, 3] - gt_bboxes[:, 1]))[None]  # (1, G)
    areas = jnp.where(ok, areas, INF)
    gt_idx = jnp.argmin(areas, axis=1)                     # (N,)
    pos = areas.min(axis=1) < INF
    labels = jnp.where(pos, gt_labels[gt_idx], num_classes)
    tgt = jnp.take_along_axis(ltrb, gt_idx[:, None, None], axis=1)[:, 0]
    return labels, tgt, pos


class FCOSLossConfig(NamedTuple):
    num_classes: int = 80
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.0
    loss_ctr_weight: float = 1.0


def fcos_detection_loss(out: FCOSHeadOutputs, points, meta, gt_bboxes,
                        gt_labels, gt_valid, cfg: FCOSLossConfig):
    B = out.cls_scores[0].shape[0]
    C = cfg.num_classes
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], axis=1)
    reg_flat = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], axis=1)
    ctr_flat = jnp.concatenate(
        [c.reshape(B, -1) for c in out.centernesses], axis=1)
    # reference: bbox_pred distances are multiplied by the stride at loss
    # time through the point coords being in image space and norm_on_bbox
    # False -> raw exp outputs regress image-space distances directly.

    labels, tgt, pos = jax.vmap(
        lambda b, l, v: _fcos_targets(points, meta, b, l, v, C))(
        gt_bboxes, gt_labels, gt_valid)                    # (B, N, ...)

    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
    onehot = jax.nn.one_hot(labels, C + 1)[..., :C]
    loss_cls = cfg.loss_cls_weight * L.sigmoid_focal_loss(
        cls_flat.reshape(-1, C), onehot.reshape(-1, C),
        avg_factor=num_pos, gamma=cfg.focal_gamma, alpha=cfg.focal_alpha)

    # centerness targets (fcos_head.centerness_target)
    lr = tgt[..., 0::2]
    tb = tgt[..., 1::2]
    ctr_tgt = jnp.sqrt(jnp.clip(
        (lr.min(-1) / jnp.clip(lr.max(-1), 1e-6, None))
        * (tb.min(-1) / jnp.clip(tb.max(-1), 1e-6, None)), 0, None))
    ctr_tgt = jnp.where(pos, ctr_tgt, 0.0)

    pred_boxes = distance2bbox(
        jnp.broadcast_to(points[None], (B,) + points.shape).reshape(-1, 2),
        reg_flat.reshape(-1, 4))
    tgt_boxes = distance2bbox(
        jnp.broadcast_to(points[None], (B,) + points.shape).reshape(-1, 2),
        tgt.reshape(-1, 4))
    w = (pos.astype(jnp.float32) * ctr_tgt).reshape(-1)
    # config loss_bbox = IoULoss(loss_weight=1.0): mmdet's default 'log'
    # mode, -log(IoU) — not GIoU (that's the center-normbbox-giou variant)
    loss_bbox = cfg.loss_bbox_weight * L.iou_loss(
        pred_boxes, tgt_boxes, linear=False, weight=w,
        avg_factor=jnp.clip(ctr_tgt.sum(), 1e-6, None))

    loss_ctr = cfg.loss_ctr_weight * L.bce_loss(
        ctr_flat.reshape(-1), ctr_tgt.reshape(-1),
        weight=pos.astype(jnp.float32).reshape(-1), avg_factor=num_pos)
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                loss_centerness=loss_ctr)


def fcos_get_bboxes(out: FCOSHeadOutputs, points, img_hw,
                    scale_factor=None, score_thr: float = 0.05,
                    nms_iou: float = 0.5, nms_pre: int = 1000,
                    max_per_img: int = 100, rescale: bool = False):
    """sigmoid(cls)*sqrt? — reference multiplies score by centerness before
    NMS (fcos_head._get_bboxes_single)."""
    B = out.cls_scores[0].shape[0]
    C = out.cls_scores[0].shape[-1]
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], axis=1)
    reg_flat = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], axis=1)
    ctr_flat = jnp.concatenate(
        [c.reshape(B, -1) for c in out.centernesses], axis=1)

    level_sizes = [c.shape[1] * c.shape[2] for c in out.cls_scores]

    def per_image(cls_s, reg, ctr, hw, sf):
        probs = jax.nn.sigmoid(cls_s) * jax.nn.sigmoid(ctr)[:, None]
        # nms_pre applies PER LEVEL (the reference's
        # _get_bboxes_single loops levels)
        top = filter_scores_and_topk_mlvl(probs, score_thr,
                                          nms_pre, level_sizes)
        boxes = distance2bbox(points[top.keep_idxs], reg[top.keep_idxs])
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
    nb, ns, nl, keep = jax.vmap(per_image)(cls_flat, reg_flat, ctr_flat,
                                           img_hw, scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=keep)


# --- family registrations (dskd_tpu/registry.py) ------------------------

def _register():
    from ..registry import register_family

    def build(cfg, arch):
        m = cfg.model
        return FCOS(num_classes=m.num_classes, depth=m.depth,
                    frozen_stages=m.frozen_stages, backbone=m.backbone,
                    nas_fpn=(arch == "nasfcos"))

    def losses(model, cfg, **_):
        det_cfg = FCOSLossConfig(num_classes=cfg.model.num_classes)
        stoch_bb = cfg.model.backbone.startswith(("effb", "swin", "pvt"))

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=not stoch_bb,
                              rngs={"dropout": rng} if stoch_bb else None)
            points, meta = fcos_points(
                [c.shape[1:3] for c in out.head.cls_scores])
            return fcos_detection_loss(
                out.head, points, meta, batch.gt_bboxes, batch.gt_labels,
                batch.gt_valid, det_cfg), None
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            points, _ = fcos_points(
                [c.shape[1:3] for c in out.head.cls_scores])
            d = fcos_get_bboxes(out.head, points, img_hw,
                                scale_factor=scale_factors,
                                score_thr=max(score_thr, 0.05),
                                max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    for name in ("fcos", "nasfcos"):
        register_family(name,
                        build=(lambda cfg, _a=name: build(cfg, _a)),
                        losses=losses, eval_step=eval_step)


_register()

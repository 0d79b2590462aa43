"""VarifocalNet (VFNet) family (parity: mmdet dense_heads/vfnet_head.py +
configs/vfnet/vfnet_r50_fpn_1x_coco.py, box AP 41.6).

FCOS-style point head with two refinements:
  * star-shaped deformable refinement — the 9 taps of a 3x3 DCN are
    relocated onto the INITIAL box's corners/edge-midpoints (star_dcn
    offsets, gradient_mul=0.1 detach-mix), feeding both the refined
    regression branch and the classification branch;
  * varifocal classification — the IoU-aware score trained with
    varifocal_loss (core/losses.py) against q = IoU(refined, gt).
Initial distances come from exp(scale * conv) * reg_denom per level; the
refined box multiplies the initial distances by exp'd refinement factors.
Assignment is ATSS on one scale-8 square anchor per cell (vfnet config's
ATSSAssigner(topk=9)).

TPU notes: the star DCN is ops.deform_conv.deform_conv2d with externally
computed offsets (static 3x3 tap grid subtracted analytically); everything
else is shared-tower convs + GN, fully static shapes.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.anchors import base_anchors, grid_anchors
from ..core.atss import atss_assign
from ..core.boxes import bbox_overlaps, distance2bbox
from ..core.postprocess import batched_nms, filter_scores_and_topk, \
    filter_scores_and_topk_mlvl
from ..ops.deform_conv import deform_conv2d
from .fcos import Scale
from .fpn import FPN
from .gfl_detr_head import bias_init_with_prob
from .resnet import ResNet

STRIDES = (8, 16, 32, 64, 128)
ANCHOR_SCALE = 8
GRADIENT_MUL = 0.1


class VFNetHeadOutputs(NamedTuple):
    cls_scores: Tuple[jnp.ndarray, ...]     # (B, H, W, C) varifocal logits
    bbox_preds: Tuple[jnp.ndarray, ...]     # (B, H, W, 4) initial ltrb
    bbox_preds_refine: Tuple[jnp.ndarray, ...]  # (B, H, W, 4) refined ltrb


class VFNetOutputs(NamedTuple):
    head: VFNetHeadOutputs
    neck_feats: Tuple[jnp.ndarray, ...]


def star_dcn_offsets(ltrb: jnp.ndarray, stride: int) -> jnp.ndarray:
    """(B, H, W, 4) image-space initial distances -> (B, H, W, 18) DCN
    offset params placing the 9 taps on the star points of the box
    (vfnet_head.star_dcn_offset). Offsets are relative to the regular
    3x3 tap grid (deform_conv2d adds the grid itself)."""
    d = (GRADIENT_MUL * ltrb
         + (1 - GRADIENT_MUL) * jax.lax.stop_gradient(ltrb)) / stride
    l, t, r, b = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    zero = jnp.zeros_like(l)
    offs = []
    for i, dy in enumerate((-t, zero, b)):        # tap rows: top/mid/bottom
        for j, dx in enumerate((-l, zero, r)):    # tap cols: left/ctr/right
            offs.append(dy - (i - 1))
            offs.append(dx - (j - 1))
    return jnp.stack(offs, axis=-1)               # (B, H, W, 18)


class VFNetHead(nn.Module):
    num_classes: int = 80
    stacked_convs: int = 3
    feat_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> VFNetHeadOutputs:
        C = self.feat_channels
        # init parity (vfnet_head.py:104-112): every conv Normal(std=0.01),
        # vfnet_cls bias at prior prob 0.01
        n01 = nn.initializers.normal(0.01)
        convs = {}
        for p in ("cls", "reg"):
            for i in range(self.stacked_convs):
                convs[f"{p}{i}"] = nn.Conv(
                    C, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=n01, name=f"{p}_conv{i}")
                convs[f"{p}{i}_gn"] = nn.GroupNorm(
                    epsilon=1e-5, num_groups=32, name=f"{p}_gn{i}")
        reg_conv = nn.Conv(C, (3, 3), padding=[(1, 1), (1, 1)],
                           use_bias=False, kernel_init=n01,
                           name="vfnet_reg_conv")
        reg_conv_gn = nn.GroupNorm(epsilon=1e-5, num_groups=32,
                                   name="vfnet_reg_conv_gn")
        reg_out = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                          kernel_init=n01, name="vfnet_reg")
        refine_w = self.param("reg_refine_dconv_kernel",
                              nn.initializers.normal(0.01), (3, 3, C, C))
        refine_out = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                             kernel_init=n01, name="vfnet_reg_refine")
        cls_w = self.param("cls_dconv_kernel",
                           nn.initializers.normal(0.01), (3, 3, C, C))
        cls_out = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=n01,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="vfnet_cls")

        cls_scores, init_preds, refine_preds = [], [], []
        for lvl, f in enumerate(feats):
            stride = STRIDES[lvl]
            # vfnet_head.py:133-136: reg_denoms are the regress-range ends
            # [64, 128, 256, 512, 512*2] == stride * 8 at every level
            reg_denom = stride * 8.0
            c = r = f
            for i in range(self.stacked_convs):
                c = nn.relu(convs[f"cls{i}_gn"](convs[f"cls{i}"](c)))
                r = nn.relu(convs[f"reg{i}_gn"](convs[f"reg{i}"](r)))
            ri = nn.relu(reg_conv_gn(reg_conv(r)))
            init = jnp.exp(Scale(name=f"scale{lvl}")(reg_out(ri))) \
                * reg_denom                            # image-space ltrb
            offs = star_dcn_offsets(init, stride)
            r_ref = nn.relu(deform_conv2d(r, offs, refine_w))
            factor = jnp.exp(Scale(name=f"scale_refine{lvl}")(
                refine_out(r_ref)))
            # vfnet_head.py:298 multiplies bbox_pred.detach(): refine-loss
            # gradients reach the initial branch only via the star offsets'
            # gradient_mul mix, never through this product
            refine = factor * jax.lax.stop_gradient(init)
            c_ref = nn.relu(deform_conv2d(c, offs, cls_w))
            cls_scores.append(cls_out(c_ref))
            init_preds.append(init)
            refine_preds.append(refine)
        return VFNetHeadOutputs(tuple(cls_scores), tuple(init_preds),
                                tuple(refine_preds))


class VFNet(nn.Module):
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = 1

    @nn.compact
    def __call__(self, images, img_hw, deterministic: bool = True):
        feats = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                       frozen_stages=self.frozen_stages,
                       name="backbone")(images)
        neck = FPN(out_channels=256, num_outs=5, start_level=1,
                   add_extra_convs="on_output",
                   relu_before_extra_convs=True, name="neck")(feats)
        head = VFNetHead(num_classes=self.num_classes,
                         name="bbox_head")(neck)
        return VFNetOutputs(head, neck)


def vfnet_points(featmap_sizes):
    """Flattened point centers (N, 2) + per-level anchor grid for ATSS."""
    import numpy as np
    pts, per_level, counts = [], [], []
    for (h, w), stride in zip(featmap_sizes, STRIDES):
        ys, xs = np.mgrid[:h, :w]
        pts.append(np.stack([(xs + 0.5) * stride, (ys + 0.5) * stride],
                            -1).reshape(-1, 2))
        base = base_anchors(stride, (ANCHOR_SCALE,), (1.0,))
        a = grid_anchors((h, w), stride, base)
        per_level.append(a)
        counts.append(a.shape[0])
    return (jnp.asarray(np.concatenate(pts), jnp.float32),
            jnp.concatenate(per_level, axis=0), tuple(counts))


class VFNetLossConfig(NamedTuple):
    num_classes: int = 80
    vfl_alpha: float = 0.75
    vfl_gamma: float = 2.0
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.5      # initial GIoU
    loss_bbox_refine_weight: float = 2.0
    topk: int = 9


def vfnet_loss(out: VFNetHeadOutputs, points, anchors, level_counts,
               gt_bboxes, gt_labels, gt_valid,
               cfg: VFNetLossConfig) -> Dict[str, jnp.ndarray]:
    B = out.cls_scores[0].shape[0]
    C = cfg.num_classes
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], 1)
    init_flat = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], 1)
    ref_flat = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds_refine], 1)

    assign = jax.vmap(
        lambda b, l, v: atss_assign(anchors, level_counts, b, l, v, C,
                                    topk=cfg.topk))(
        gt_bboxes, gt_labels, gt_valid)
    pos = assign.pos_mask                                    # (B, N)
    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
    G = gt_bboxes.shape[1]
    tgt = jnp.take_along_axis(
        gt_bboxes, jnp.clip(assign.assigned_gt, 0, G - 1)[..., None],
        axis=1)                                              # (B, N, 4)

    init_boxes = jax.vmap(lambda d: distance2bbox(points, d))(init_flat)
    ref_boxes = jax.vmap(lambda d: distance2bbox(points, d))(ref_flat)

    # vfnet_head.py:441-470: each positive is weighted by its CURRENT
    # (detached) IoU with the target and the normalizer is the weight sum,
    # separately for the initial and refined branches
    posf = pos.astype(jnp.float32)
    iou_ini = jax.lax.stop_gradient(jax.vmap(
        lambda p, t: bbox_overlaps(p, t, is_aligned=True))(init_boxes, tgt))
    w_ini = (jnp.clip(iou_ini, 1e-6) * posf).reshape(-1)
    loss_bbox = cfg.loss_bbox_weight * L.giou_loss(
        init_boxes.reshape(-1, 4), tgt.reshape(-1, 4), weight=w_ini,
        avg_factor=jnp.maximum(w_ini.sum(), 1.0))

    iou_rf = jax.lax.stop_gradient(jax.vmap(
        lambda p, t: bbox_overlaps(p, t, is_aligned=True))(ref_boxes, tgt))
    w_rf = (jnp.clip(iou_rf, 1e-6) * posf).reshape(-1)
    loss_bbox_rf = cfg.loss_bbox_refine_weight * L.giou_loss(
        ref_boxes.reshape(-1, 4), tgt.reshape(-1, 4), weight=w_rf,
        avg_factor=jnp.maximum(w_rf.sum(), 1.0))

    # varifocal target: q = IoU(refined, gt) at positives, one-hot class
    q = jnp.where(pos, iou_rf, 0.0)
    onehot = jax.nn.one_hot(assign.labels, C + 1)[..., :C]
    vfl_target = onehot * q[..., None]
    loss_cls = cfg.loss_cls_weight * L.varifocal_loss(
        cls_flat.reshape(-1, C), vfl_target.reshape(-1, C),
        avg_factor=num_pos, alpha=cfg.vfl_alpha, gamma=cfg.vfl_gamma)
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                loss_bbox_rf=loss_bbox_rf)


def vfnet_get_bboxes(out: VFNetHeadOutputs, points, img_hw,
                     scale_factor=None, score_thr: float = 0.05,
                     nms_iou: float = 0.6, nms_pre: int = 1000,
                     max_per_img: int = 100, rescale: bool = False):
    """Decode REFINED boxes scored by the varifocal score (no centerness —
    the score is already IoU-aware)."""
    B = out.cls_scores[0].shape[0]
    C = out.cls_scores[0].shape[-1]
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], 1)
    ref_flat = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds_refine], 1)

    level_sizes = [c.shape[1] * c.shape[2] for c in out.cls_scores]

    def per_image(cls_s, dist, hw, sf):
        probs = jax.nn.sigmoid(cls_s)
        # nms_pre applies PER LEVEL (the reference's
        # _get_bboxes_single loops levels)
        top = filter_scores_and_topk_mlvl(probs, score_thr,
                                          nms_pre, level_sizes)
        boxes = distance2bbox(points[top.keep_idxs], dist[top.keep_idxs])
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
    nb, ns, nl, keep = jax.vmap(per_image)(cls_flat, ref_flat, img_hw,
                                           scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=keep)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return VFNet(num_classes=m.num_classes, depth=m.depth,
                     frozen_stages=m.frozen_stages)

    def losses(model, cfg, **_):
        det_cfg = VFNetLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            points, anchors, counts = vfnet_points(
                [c.shape[1:3] for c in out.head.cls_scores])
            return vfnet_loss(out.head, points, anchors, counts,
                              batch.gt_bboxes, batch.gt_labels,
                              batch.gt_valid, det_cfg), None
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            points, _, _ = vfnet_points(
                [c.shape[1:3] for c in out.head.cls_scores])
            d = vfnet_get_bboxes(out.head, points, img_hw,
                                 scale_factor=scale_factors,
                                 score_thr=max(score_thr, 0.05),
                                 max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("vfnet", build=build, losses=losses,
                    eval_step=eval_step)


_register()

"""Guided Anchoring RetinaNet (parity: mmdet dense_heads/
guided_anchor_head.py + ga_retina_head.py + configs/guided_anchoring/
ga_retinanet_r50_fpn_1x_coco.py, box AP 36.9).

Anchors are PREDICTED, not enumerated:
  * a location branch scores where anchors should live (binary focal
    loss on the gt's 0.2-center region, 0.5-ring ignored — the
    anchor-free FSAF-style target geometry);
  * a shape branch predicts (dw, dh) so anchor wh = sigma * stride *
    exp(d*) at each cell; trained with the bounded-IoU loss against the
    best-overlapping gt of that cell (responsibility decided by the 9
    octave/ratio approx anchors' max IoU, the ApproxMaxIoU rule);
  * a feature-adaption deformable conv, its offsets driven by the
    detached shape prediction, remaps features before the cls/reg
    towers;
  * the final cls/reg branches train against the PREDICTED (detached)
    guided anchors under standard MaxIoU assignment + focal/SmoothL1.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core import losses as L
from ..core.anchors import base_anchors, bbox2delta, delta2bbox, \
    grid_anchors
from ..core.boxes import bbox_overlaps
from ..core.max_iou_assigner import max_iou_assign
from ..core.postprocess import batched_nms, filter_scores_and_topk
from ..ops.deform_conv import deform_conv2d
from .fpn import FPN
from .gfl_detr_head import bias_init_with_prob
from .resnet import ResNet

STRIDES = (8, 16, 32, 64, 128)
OCTAVE_SCALE = 4
ANCHOR_SIGMA = 8.0      # square anchor wh = sigma * stride at d = 0
APPROX_SCALES = tuple(OCTAVE_SCALE * 2 ** (i / 3) for i in range(3))
APPROX_RATIOS = (0.5, 1.0, 2.0)
CENTER_RATIO = 0.2
IGNORE_RATIO = 0.5


class GAHeadOutputs(NamedTuple):
    cls_scores: Tuple[jnp.ndarray, ...]   # (B, H, W, C)
    bbox_preds: Tuple[jnp.ndarray, ...]   # (B, H, W, 4) deltas
    loc_preds: Tuple[jnp.ndarray, ...]    # (B, H, W, 1) logits
    shape_preds: Tuple[jnp.ndarray, ...]  # (B, H, W, 2) (dw, dh)


class GAOutputs(NamedTuple):
    head: GAHeadOutputs
    neck_feats: Tuple[jnp.ndarray, ...]


def bounded_iou_loss(pred, target, beta: float = 0.2, eps: float = 1e-3):
    """mmdet losses/iou_loss.py bounded_iou_loss: per-coordinate bounded
    ratios smoothed SmoothL1-style. pred/target xyxy -> (N, 4) losses."""
    px = (pred[:, 0] + pred[:, 2]) * 0.5
    py = (pred[:, 1] + pred[:, 3]) * 0.5
    pw = pred[:, 2] - pred[:, 0]
    ph = pred[:, 3] - pred[:, 1]
    tx = (target[:, 0] + target[:, 2]) * 0.5
    ty = (target[:, 1] + target[:, 3]) * 0.5
    tw = target[:, 2] - target[:, 0]
    th = target[:, 3] - target[:, 1]
    dx = tx - px
    dy = ty - py
    loss_dx = 1 - jnp.clip((tw - 2 * jnp.abs(dx))
                           / (tw + 2 * jnp.abs(dx) + eps), 0)
    loss_dy = 1 - jnp.clip((th - 2 * jnp.abs(dy))
                           / (th + 2 * jnp.abs(dy) + eps), 0)
    loss_dw = 1 - jnp.minimum(tw / (pw + eps), pw / (tw + eps))
    loss_dh = 1 - jnp.minimum(th / (ph + eps), ph / (th + eps))
    comb = jnp.stack([loss_dx, loss_dy, loss_dw, loss_dh], -1)
    return jnp.where(comb < beta, 0.5 * comb ** 2 / beta,
                     comb - 0.5 * beta)


class GARetinaHead(nn.Module):
    num_classes: int = 80
    stacked_convs: int = 4
    feat_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> GAHeadOutputs:
        C = self.feat_channels
        convs = {}
        for i in range(self.stacked_convs):
            for p in ("cls", "reg"):
                convs[f"{p}{i}"] = nn.Conv(
                    C, (3, 3), padding=[(1, 1), (1, 1)],
                    name=f"{p}_conv{i}")
        conv_loc = nn.Conv(
            1, (1, 1),
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="conv_loc")
        conv_shape = nn.Conv(2, (1, 1), kernel_init=nn.initializers.zeros,
                             bias_init=nn.initializers.zeros,
                             name="conv_shape")
        offset_cls = nn.Conv(18, (1, 1), kernel_init=nn.initializers.zeros,
                             bias_init=nn.initializers.zeros,
                             name="cls_adaption_offset")
        offset_reg = nn.Conv(18, (1, 1), kernel_init=nn.initializers.zeros,
                             bias_init=nn.initializers.zeros,
                             name="reg_adaption_offset")
        w_cls_ad = self.param("cls_adaption_kernel",
                              nn.initializers.normal(0.01), (3, 3, C, C))
        w_reg_ad = self.param("reg_adaption_kernel",
                              nn.initializers.normal(0.01), (3, 3, C, C))
        retina_cls = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="ga_retina_cls")
        retina_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                             name="ga_retina_reg")

        cls_out, reg_out, loc_out, shape_out = [], [], [], []
        for f in feats:
            loc = conv_loc(f)
            shape = conv_shape(f)
            sg = jax.lax.stop_gradient(shape)
            # feature adaption: DCN offsets predicted from the shape
            fa_c = nn.relu(deform_conv2d(f, offset_cls(sg), w_cls_ad))
            fa_r = nn.relu(deform_conv2d(f, offset_reg(sg), w_reg_ad))
            c, r = fa_c, fa_r
            for i in range(self.stacked_convs):
                c = nn.relu(convs[f"cls{i}"](c))
                r = nn.relu(convs[f"reg{i}"](r))
            cls_out.append(retina_cls(c))
            reg_out.append(retina_reg(r))
            loc_out.append(loc)
            shape_out.append(shape)
        return GAHeadOutputs(tuple(cls_out), tuple(reg_out),
                             tuple(loc_out), tuple(shape_out))


class GARPNHead(nn.Module):
    """ga_rpn_head.py: a 3x3 rpn_conv, then the GuidedAnchorHead parts —
    loc/shape branches, ONE shape-steered feature adaption, 1x1
    objectness + regression (proposal head, cls_out_channels = 1)."""
    feat_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> GAHeadOutputs:
        C = self.feat_channels
        rpn_conv = nn.Conv(C, (3, 3), padding=[(1, 1), (1, 1)],
                           name="rpn_conv")
        conv_loc = nn.Conv(
            1, (1, 1),
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="conv_loc")
        conv_shape = nn.Conv(2, (1, 1), kernel_init=nn.initializers.zeros,
                             bias_init=nn.initializers.zeros,
                             name="conv_shape")
        offset = nn.Conv(18, (1, 1), kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros,
                         name="adaption_offset")
        w_ad = self.param("adaption_kernel",
                          nn.initializers.normal(0.01), (3, 3, C, C))
        conv_cls = nn.Conv(
            1, (1, 1),
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="conv_cls")
        conv_reg = nn.Conv(4, (1, 1), name="conv_reg")

        cls_out, reg_out, loc_out, shape_out = [], [], [], []
        for f in feats:
            x = nn.relu(rpn_conv(f))
            loc = conv_loc(x)
            shape = conv_shape(x)
            sg = jax.lax.stop_gradient(shape)
            fa = nn.relu(deform_conv2d(x, offset(sg), w_ad))
            cls_out.append(conv_cls(fa))
            reg_out.append(conv_reg(fa))
            loc_out.append(loc)
            shape_out.append(shape)
        return GAHeadOutputs(tuple(cls_out), tuple(reg_out),
                             tuple(loc_out), tuple(shape_out))


class GARPN(nn.Module):
    """Guided-anchoring region proposal network (configs/guided_anchoring/
    ga_rpn_r50_caffe_fpn_1x_coco.py, AR1000 68.4; proposal AR protocol)."""
    depth: int = 50
    frozen_stages: int = 1

    @nn.compact
    def __call__(self, images, img_hw, deterministic: bool = True):
        feats = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                       frozen_stages=self.frozen_stages,
                       name="backbone")(images)
        neck = FPN(out_channels=256, num_outs=5, start_level=0,
                   add_extra_convs="", name="neck")(feats)
        head = GARPNHead(name="rpn_head")(neck)
        return GAOutputs(head, neck)


class GARetinaNet(nn.Module):
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = 1

    @nn.compact
    def __call__(self, images, img_hw, deterministic: bool = True):
        feats = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                       frozen_stages=self.frozen_stages,
                       name="backbone")(images)
        neck = FPN(out_channels=256, num_outs=5, start_level=1,
                   add_extra_convs="on_input",
                   relu_before_extra_convs=False, name="neck")(feats)
        head = GARetinaHead(num_classes=self.num_classes,
                            name="bbox_head")(neck)
        return GAOutputs(head, neck)


def ga_geometry(featmap_sizes):
    """(centers (N, 2), strides (N,), approxs (N, 9, 4), counts)."""
    pts, strides, ap, counts = [], [], [], []
    for (h, w), s in zip(featmap_sizes, STRIDES):
        ys, xs = np.mgrid[:h, :w]
        pts.append(np.stack([(xs + 0.5) * s, (ys + 0.5) * s],
                            -1).reshape(-1, 2))
        strides.append(np.full((h * w,), s, np.float32))
        base = base_anchors(s, APPROX_SCALES, APPROX_RATIOS)
        ap.append(grid_anchors((h, w), s, base).reshape(-1, 9, 4))
        counts.append(h * w)
    return (jnp.asarray(np.concatenate(pts), jnp.float32),
            jnp.asarray(np.concatenate(strides)),
            jnp.concatenate(ap, 0), tuple(counts))


def guided_anchors(centers, strides, shape_flat):
    """(B, N, 4) anchors from predicted (dw, dh)."""
    wh = ANCHOR_SIGMA * strides[None, :, None] \
        * jnp.exp(jnp.clip(shape_flat, -4.0, 4.0))
    return jnp.concatenate([centers[None] - wh / 2,
                            centers[None] + wh / 2], -1)


class GALossConfig(NamedTuple):
    num_classes: int = 80
    # GA-RPN trains its objectness with plain sigmoid CE
    # (ga_rpn config loss_cls CrossEntropyLoss use_sigmoid), GA-Retina
    # with focal
    focal_cls: bool = True
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_loc_weight: float = 1.0
    loss_shape_weight: float = 1.0
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.0
    smooth_beta: float = 1.0 / 9.0


def ga_loss(out: GAHeadOutputs, centers, strides, approxs, level_counts,
            gt_bboxes, gt_labels, gt_valid, cfg: GALossConfig
            ) -> Dict[str, jnp.ndarray]:
    B = out.cls_scores[0].shape[0]
    C = cfg.num_classes
    N = centers.shape[0]
    G = gt_bboxes.shape[1]
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], 1)
    reg_flat = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], 1)
    loc_flat = jnp.concatenate(
        [r.reshape(B, -1) for r in out.loc_preds], 1)
    shape_flat = jnp.concatenate(
        [r.reshape(B, -1, 2) for r in out.shape_preds], 1)
    anchors = guided_anchors(centers, strides, shape_flat)   # (B, N, 4)

    def per_image(loc, shp, anc, gb, gl, gv):
        # --- location targets: center region pos, ring ignored ---
        def region(ratio):
            cx = (gb[:, 0] + gb[:, 2]) / 2
            cy = (gb[:, 1] + gb[:, 3]) / 2
            hw = (gb[:, 2] - gb[:, 0]) * ratio / 2
            hh = (gb[:, 3] - gb[:, 1]) * ratio / 2
            return ((centers[:, 0][:, None] >= (cx - hw)[None])
                    & (centers[:, 0][:, None] <= (cx + hw)[None])
                    & (centers[:, 1][:, None] >= (cy - hh)[None])
                    & (centers[:, 1][:, None] <= (cy + hh)[None])
                    & gv[None])
        pos_loc = region(CENTER_RATIO).any(1)
        ign_loc = region(IGNORE_RATIO).any(1) & ~pos_loc
        w_loc = jnp.where(ign_loc, 0.0, 1.0)

        # --- shape targets: responsibility by approx max IoU ---
        ious = bbox_overlaps(approxs.reshape(-1, 4), gb)
        ious = jnp.where(gv[None], ious.reshape(N, 9, G).max(1), -1.0)
        best = jnp.argmax(ious, 1)
        resp = ious.max(1) >= 0.5                    # responsible cells
        tgt = gb[jnp.clip(best, 0, G - 1)]
        shape_l = bounded_iou_loss(anc, tgt).sum(-1)
        n_resp = jnp.maximum(resp.sum().astype(jnp.float32), 1.0)
        loss_shape = (jnp.where(resp, shape_l, 0.0)).sum() / n_resp
        return pos_loc, w_loc, loss_shape

    pos_loc, w_loc, shape_losses = jax.vmap(per_image)(
        loc_flat, shape_flat, anchors, gt_bboxes, gt_labels, gt_valid)
    n_loc = jnp.maximum(pos_loc.sum().astype(jnp.float32), 1.0)
    loss_loc = cfg.loss_loc_weight * L.sigmoid_focal_loss(
        loc_flat.reshape(-1, 1),
        pos_loc.astype(jnp.float32).reshape(-1, 1),
        weight=w_loc.reshape(-1, 1), avg_factor=n_loc)
    loss_shape = cfg.loss_shape_weight * shape_losses.mean()

    # --- head losses on the predicted (detached) anchors ---
    anchors_d = jax.lax.stop_gradient(anchors)
    assign = jax.vmap(lambda a, gb, gl, gv: max_iou_assign(
        a, gb, gl, gv, C, pos_iou_thr=0.5, neg_iou_thr=0.4,
        min_pos_iou=0.4))(anchors_d, gt_bboxes, gt_labels, gt_valid)
    pos = assign.assigned_gt >= 0
    ignore = assign.assigned_gt == -2
    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
    safe = jnp.clip(assign.assigned_gt, 0, G - 1)
    tgt = jnp.take_along_axis(gt_bboxes, safe[..., None], axis=1)

    onehot = jax.nn.one_hot(assign.labels, C + 1)[..., :C]
    if cfg.focal_cls:
        loss_cls = cfg.loss_cls_weight * L.sigmoid_focal_loss(
            cls_flat.reshape(-1, C), onehot.reshape(-1, C),
            weight=jnp.where(ignore, 0.0, 1.0).reshape(-1, 1),
            avg_factor=num_pos, gamma=cfg.focal_gamma,
            alpha=cfg.focal_alpha)
    else:
        loss_cls = cfg.loss_cls_weight * L.bce_loss(
            cls_flat.reshape(-1), onehot.reshape(-1),
            weight=jnp.where(ignore, 0.0, 1.0)
            .repeat(C, -1).reshape(-1),
            avg_factor=jnp.maximum((~ignore).sum().astype(
                jnp.float32) * C, 1.0))
    deltas_t = jax.vmap(bbox2delta)(anchors_d, tgt)
    wreg = jnp.repeat(pos.astype(jnp.float32)[..., None], 4,
                      -1).reshape(-1, 4)
    loss_bbox = cfg.loss_bbox_weight * L.smooth_l1_loss(
        reg_flat.reshape(-1, 4), deltas_t.reshape(-1, 4), weight=wreg,
        avg_factor=num_pos * 4, beta=cfg.smooth_beta)
    return dict(loss_loc=loss_loc, loss_shape=loss_shape,
                loss_cls=loss_cls, loss_bbox=loss_bbox)


def ga_get_bboxes(out: GAHeadOutputs, centers, strides, img_hw,
                  scale_factor=None, score_thr: float = 0.05,
                  loc_thr: float = 0.01, nms_iou: float = 0.5,
                  nms_pre: int = 1000, max_per_img: int = 100,
                  rescale: bool = False):
    B = out.cls_scores[0].shape[0]
    C = out.cls_scores[0].shape[-1]
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], 1)
    reg_flat = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], 1)
    loc_flat = jnp.concatenate(
        [r.reshape(B, -1) for r in out.loc_preds], 1)
    shape_flat = jnp.concatenate(
        [r.reshape(B, -1, 2) for r in out.shape_preds], 1)
    anchors = guided_anchors(centers, strides, shape_flat)

    def per_image(cls_s, delta, loc, anc, hw, sf):
        # anchor-free masking by the location score
        keep = jax.nn.sigmoid(loc) >= loc_thr
        probs = jax.nn.sigmoid(cls_s) * keep[:, None]
        top = filter_scores_and_topk(probs, score_thr, nms_pre)
        boxes = delta2bbox(anc[top.keep_idxs], delta[top.keep_idxs])
        h, w = hw[0].astype(boxes.dtype), hw[1].astype(boxes.dtype)
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, w), jnp.clip(boxes[:, 1], 0, h),
            jnp.clip(boxes[:, 2], 0, w), jnp.clip(boxes[:, 3], 0, h)], -1)
        nb, ns, nl, keep2, _ = batched_nms(boxes, top.scores, top.labels,
                                           nms_iou, max_per_img,
                                           valid=top.valid)
        if rescale and sf is not None:
            nb = nb / sf[None]
        return nb, ns, nl, keep2

    if scale_factor is None:
        scale_factor = jnp.ones((B, 4), jnp.float32)
    nb, ns, nl, keep = jax.vmap(per_image)(cls_flat, reg_flat, loc_flat,
                                           anchors, img_hw, scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=keep)

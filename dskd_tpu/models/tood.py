"""TOOD: Task-aligned One-stage Object Detection (parity: mmdet
dense_heads/tood_head.py + configs/tood/tood_r50_fpn_1x_coco.py, AP 42.4).

The three TOOD mechanisms, rebuilt TPU-first:
  * task-interactive tower: 6 shared convs whose per-layer outputs are
    recombined by cls/reg TaskDecomposition blocks (GAP -> layer-attention
    sigmoid over the 6 layers -> 1x1 reduction + GN);
  * task-aligned predictions: the classification output is
    sqrt(sigmoid(logits) * sigmoid(spatial prob)) — a PROBABILITY map —
    and each side of the decoded box is re-sampled at a learned per-side
    offset (deform_sampling as analytic bilinear reads, no op needed);
  * task-aligned assignment (TAL): alignment t = s^alpha * IoU^beta
    (alpha=1, beta=6), top-13 candidates with centers inside the GT,
    conflicts resolved by max IoU; cls targets are the per-GT-normalized
    alignment (t / max_t * max_IoU), trained with the activated
    quality-focal form; GIoU weighted by the same alignment.

The reference trains the first ``initial_epoch``=4 epochs with ATSS +
focal before switching to TAL; both paths are implemented
(``tood_loss(..., use_tal=False)`` gives the initial stage) and the family
step uses TAL (the steady-state objective).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.anchors import base_anchors, grid_anchors
from ..core.atss import atss_assign
from ..core.boxes import bbox_overlaps
from ..core.postprocess import batched_nms, filter_scores_and_topk, \
    filter_scores_and_topk_mlvl
from .fcos import Scale
from .fpn import FPN
from .gfl_detr_head import bias_init_with_prob
from .resnet import ResNet

STRIDES = (8, 16, 32, 64, 128)
ANCHOR_SCALE = 8


class TOODHeadOutputs(NamedTuple):
    cls_scores: Tuple[jnp.ndarray, ...]   # (B, H, W, C) PROBABILITIES
    bbox_preds: Tuple[jnp.ndarray, ...]   # (B, H, W, 4) image-space ltrb


class TOODOutputs(NamedTuple):
    head: TOODHeadOutputs
    neck_feats: Tuple[jnp.ndarray, ...]


def _sample_sides(dist_map: jnp.ndarray, offsets: jnp.ndarray):
    """Re-sample each of the 4 decoded-side maps at its own learned offset
    (tood_head.deform_sampling, a grouped 1x1 identity deform conv).

    dist_map: (B, H, W, 4); offsets: (B, H, W, 8) as (dy, dx) per side.
    """
    B, H, W, _ = dist_map.shape
    off = offsets.reshape(B, H, W, 4, 2)
    ii = jnp.arange(H, dtype=dist_map.dtype)[None, :, None, None]
    jj = jnp.arange(W, dtype=dist_map.dtype)[None, None, :, None]
    ys = ii + off[..., 0]
    xs = jj + off[..., 1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ty = ys - y0
    tx = xs - x0

    def corner(yc, xc, wgt):
        inb = (yc >= 0) & (yc < H) & (xc >= 0) & (xc < W)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        flat = (yi * W + xi).reshape(B, -1)                   # (B, HW4)
        v = jnp.take_along_axis(
            dist_map.reshape(B, H * W, 4),
            flat[..., None], axis=1).reshape(B, H, W, 4, 4)
        # channel c sampled at ITS offset: take the diagonal over (tap, c)
        v = jnp.diagonal(v, axis1=3, axis2=4)                 # (B, H, W, 4)
        return v * (wgt * inb.astype(dist_map.dtype))

    return (corner(y0, x0, (1 - ty) * (1 - tx))
            + corner(y0, x0 + 1, (1 - ty) * tx)
            + corner(y0 + 1, x0, ty * (1 - tx))
            + corner(y0 + 1, x0 + 1, ty * tx))


class TaskDecomposition(nn.Module):
    feat_channels: int = 256
    stacked_convs: int = 6
    la_down_rate: int = 8

    @nn.compact
    def __call__(self, stacked):
        """stacked: (B, H, W, n, C) inter-conv outputs."""
        B, H, W, n, C = stacked.shape
        flat = stacked.reshape(B, H, W, n * C)
        gap = flat.mean(axis=(1, 2), keepdims=True)           # (B,1,1,nC)
        a = nn.relu(nn.Conv(n * C // self.la_down_rate, (1, 1),
                            kernel_init=nn.initializers.normal(0.001),
                            name="la_conv1")(gap))
        a = jax.nn.sigmoid(nn.Conv(
            n, (1, 1), kernel_init=nn.initializers.normal(0.001),
            name="la_conv2")(a))
        w = a.reshape(B, 1, 1, n, 1)
        y = (stacked * w).reshape(B, H, W, n * C)
        y = nn.Conv(C, (1, 1), use_bias=False,
                    kernel_init=nn.initializers.normal(0.01),
                    name="reduction")(y)
        return nn.relu(nn.GroupNorm(epsilon=1e-5, num_groups=32,
                                    name="reduction_gn")(y))


class TOODHead(nn.Module):
    num_classes: int = 80
    stacked_convs: int = 6
    feat_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> TOODHeadOutputs:
        C = self.feat_channels
        inter = []
        for i in range(self.stacked_convs):
            inter.append((
                nn.Conv(C, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False,
                        kernel_init=nn.initializers.normal(0.01),
                        name=f"inter_conv{i}"),
                nn.GroupNorm(epsilon=1e-5, num_groups=32,
                             name=f"inter_gn{i}")))
        cls_decomp = TaskDecomposition(C, self.stacked_convs,
                                       name="cls_decomp")
        reg_decomp = TaskDecomposition(C, self.stacked_convs,
                                       name="reg_decomp")
        # init parity (tood_head.py:193-208): inter/cls_prob/reduction/
        # tood_cls/tood_reg normal(0.01); layer attention + reg_offset
        # normal(0.001); cls biases at prior prob 0.01
        tood_cls = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="tood_cls")
        tood_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                           kernel_init=nn.initializers.normal(0.01),
                           name="tood_reg")
        prob_c1 = nn.Conv(C // 4, (1, 1),
                          kernel_init=nn.initializers.normal(0.01),
                          name="cls_prob_conv1")
        prob_c2 = nn.Conv(
            1, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="cls_prob_conv2")
        off_c1 = nn.Conv(C // 4, (1, 1),
                         kernel_init=nn.initializers.normal(0.001),
                         name="reg_offset_conv1")
        off_c2 = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)],
                         kernel_init=nn.initializers.normal(0.001),
                         bias_init=nn.initializers.zeros,
                         name="reg_offset_conv2")

        cls_out, reg_out = [], []
        for lvl, f in enumerate(feats):
            stride = STRIDES[lvl]
            x = f
            layers = []
            for conv, gn in inter:
                x = nn.relu(gn(conv(x)))
                layers.append(x)
            stacked = jnp.stack(layers, axis=3)               # (B,H,W,n,C)
            flat = stacked.reshape(
                stacked.shape[:3] + (-1,))                    # (B,H,W,nC)

            cls_feat = cls_decomp(stacked)
            logits = tood_cls(cls_feat)
            prob = prob_c2(nn.relu(prob_c1(flat)))
            score = jnp.sqrt(jnp.clip(
                jax.nn.sigmoid(logits) * jax.nn.sigmoid(prob), 1e-12))

            reg_feat = reg_decomp(stacked)
            # tood_head.py:253: reg_dist = scale(tood_reg(...).exp()) —
            # the learnable Scale multiplies AFTER exp
            dist = Scale(name=f"scale{lvl}")(
                jnp.exp(tood_reg(reg_feat)))                  # stride units
            # decode to corner-coordinate maps FIRST (tood_head.py:255-258
            # distance2bbox(anchor_center/stride, reg_dist)), then
            # deform-sample each corner channel: the sampled value is the
            # NEIGHBOR's decoded corner, not own-center minus neighbor-dist
            # anchor_center(anchor)/stride with the config's default
            # center_offset=0 AnchorGenerator = the bare grid index x,
            # NOT the (x+0.5) cell center (tood_head.py:231 priors +
            # configs/tood/tood_r50_fpn_1x_coco.py:31-36)
            Hf, Wf = f.shape[1], f.shape[2]
            cy = jnp.arange(Hf, dtype=dist.dtype)[None, :, None]
            cx = jnp.arange(Wf, dtype=dist.dtype)[None, None, :]
            corner = jnp.stack([cx - dist[..., 0], cy - dist[..., 1],
                                cx + dist[..., 2], cy + dist[..., 3]], -1)
            offsets = off_c2(nn.relu(off_c1(flat)))
            boxes = _sample_sides(corner, offsets) * stride   # image xyxy
            cls_out.append(score)
            reg_out.append(boxes)
        return TOODHeadOutputs(tuple(cls_out), tuple(reg_out))


class TOOD(nn.Module):
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
                   relu_before_extra_convs=False, name="neck")(feats)
        head = TOODHead(num_classes=self.num_classes,
                        name="bbox_head")(neck)
        return TOODOutputs(head, neck)


def tood_points(featmap_sizes):
    import numpy as np
    pts, per_level, counts = [], [], []
    for (h, w), stride in zip(featmap_sizes, STRIDES):
        ys, xs = np.mgrid[:h, :w]
        # anchor centers of the offset-0 grid (matches the anchors below)
        pts.append(np.stack([xs * stride, ys * stride],
                            -1).reshape(-1, 2))
        base = base_anchors(stride, (ANCHOR_SCALE,), (1.0,))
        a = grid_anchors((h, w), stride, base)
        per_level.append(a)
        counts.append(a.shape[0])
    return (jnp.asarray(np.concatenate(pts), jnp.float32),
            jnp.concatenate(per_level, axis=0), tuple(counts))


def task_aligned_assign(scores, boxes, points, gt_bboxes, gt_labels,
                        gt_valid, num_classes: int, topk: int = 13,
                        alpha: float = 1.0, beta: float = 6.0):
    """One image (task_aligned_assigner.py): alignment s^a * IoU^b, top-k
    per GT among center-inside candidates, conflicts -> max IoU.

    scores: (N, C) probabilities; boxes: (N, 4) decoded. Returns
    (assigned_gt (N,), pos (N,), labels (N,), align (N,), iou (N,))."""
    N = points.shape[0]
    G = gt_bboxes.shape[0]
    ious = bbox_overlaps(boxes, gt_bboxes)                    # (N, G)
    safe_lbl = jnp.clip(gt_labels, 0, num_classes - 1)
    s = scores[:, safe_lbl]                                   # (N, G)
    align = (s ** alpha) * (ious ** beta)
    inside = ((points[:, 0][:, None] > gt_bboxes[None, :, 0])
              & (points[:, 0][:, None] < gt_bboxes[None, :, 2])
              & (points[:, 1][:, None] > gt_bboxes[None, :, 1])
              & (points[:, 1][:, None] < gt_bboxes[None, :, 3]))
    # task_aligned_assigner.py:70-78 takes the GLOBAL top-k of the
    # alignment metric per gt FIRST, then filters to center-inside —
    # top-k slots spent on outside candidates are NOT back-filled
    cand = jnp.where(gt_valid[None], align, -1.0)             # (N, G)
    k = min(topk, N)
    kth = jnp.sort(cand, axis=0)[-k]                          # (G,)
    is_pos = ((cand >= jnp.maximum(kth[None], 1e-12)) & (cand > 0)
              & inside)
    # conflicts: a point claimed by several gts goes to the max-IoU one
    iou_masked = jnp.where(is_pos, ious, -1.0)
    assigned = jnp.argmax(iou_masked, axis=1)                 # (N,)
    pos = iou_masked.max(axis=1) > 0
    labels = jnp.where(pos, safe_lbl[assigned], num_classes)
    a_sel = jnp.take_along_axis(align, assigned[:, None], 1)[:, 0]
    i_sel = jnp.take_along_axis(ious, assigned[:, None], 1)[:, 0]
    return assigned, pos, labels, jnp.where(pos, a_sel, 0.0), \
        jnp.where(pos, i_sel, 0.0)


def _qfl_activated(p, q, beta: float = 2.0):
    """Activated quality focal loss (losses/gfocal_loss.py activated=True):
    operates on probabilities, modulates BCE by |q - p|^beta."""
    eps = 1e-12
    ce = -(q * jnp.log(p + eps) + (1 - q) * jnp.log(1 - p + eps))
    return ce * jnp.abs(q - p) ** beta


def _focal_activated(p, onehot, gamma: float = 2.0, alpha: float = 0.25):
    """Activated sigmoid focal loss (losses/focal_loss.py
    py_focal_loss_with_prob): operates on probabilities."""
    eps = 1e-12
    pt = (1 - p) * onehot + p * (1 - onehot)
    fw = (alpha * onehot + (1 - alpha) * (1 - onehot)) * pt ** gamma
    ce = -(onehot * jnp.log(p + eps) + (1 - onehot) * jnp.log(1 - p + eps))
    return ce * fw


class TOODLossConfig(NamedTuple):
    num_classes: int = 80
    topk: int = 13
    alpha: float = 1.0
    beta: float = 6.0
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 2.0


def tood_loss(out: TOODHeadOutputs, points, anchors, level_counts,
              gt_bboxes, gt_labels, gt_valid, cfg: TOODLossConfig,
              use_tal: bool = True) -> Dict[str, jnp.ndarray]:
    B = out.cls_scores[0].shape[0]
    C = cfg.num_classes
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], 1)     # probs
    boxes = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], 1)    # decoded xyxy

    G = gt_bboxes.shape[1]
    if use_tal:
        assigned, pos, labels, align, iou_sel = jax.vmap(
            lambda s, bx, gb, gl, gv: task_aligned_assign(
                jax.lax.stop_gradient(s), jax.lax.stop_gradient(bx),
                points, gb, gl, gv, C, cfg.topk, cfg.alpha, cfg.beta))(
            cls_flat, boxes, gt_bboxes, gt_labels, gt_valid)
        # per-GT normalization: t / max_t * max_iou (tood_head.py targets)
        onehot_gt = jax.nn.one_hot(assigned, G) \
            * pos[..., None]                                  # (B, N, G)
        max_a = jnp.max(
            jnp.where(onehot_gt > 0, align[..., None], 0.0), axis=1)
        max_i = jnp.max(
            jnp.where(onehot_gt > 0, iou_sel[..., None], 0.0), axis=1)
        norm = jnp.take_along_axis(
            max_i / jnp.clip(max_a, 1e-12), assigned, axis=1)
        t = jnp.where(pos, align * norm, 0.0)                 # (B, N)
    else:
        assign = jax.vmap(
            lambda gb, gl, gv: atss_assign(anchors, level_counts, gb, gl,
                                           gv, C, topk=9))(
            gt_bboxes, gt_labels, gt_valid)
        assigned, pos, labels = (assign.assigned_gt, assign.pos_mask,
                                 assign.labels)
        t = pos.astype(jnp.float32)

    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
    tgt = jnp.take_along_axis(
        gt_bboxes, jnp.clip(assigned, 0, G - 1)[..., None], axis=1)

    if use_tal:
        q = jax.nn.one_hot(labels, C + 1)[..., :C] * t[..., None]
        lc = _qfl_activated(cls_flat, q).sum(-1).reshape(-1)
        loss_cls = (cfg.loss_cls_weight * lc.sum()
                    / jnp.maximum(t.sum(), 1.0))
        w = t.reshape(-1)
    else:
        # initial epochs (tood_head.py:118-124,334-346): activated
        # FocalLoss(gamma=2, alpha=.25) over num_pos, GIoU weighted by the
        # ATSS centerness of the anchor center in the assigned gt
        onehot = jax.nn.one_hot(labels, C + 1)[..., :C]
        lc = _focal_activated(cls_flat, onehot).sum(-1).reshape(-1)
        loss_cls = cfg.loss_cls_weight * lc.sum() / num_pos
        from .atss import _centerness_target
        ctr = jax.vmap(_centerness_target)(
            jnp.broadcast_to(anchors, (B,) + anchors.shape), tgt)
        w = (jnp.where(pos, ctr, 0.0)).reshape(-1)

    loss_bbox = cfg.loss_bbox_weight * L.giou_loss(
        boxes.reshape(-1, 4), tgt.reshape(-1, 4), weight=w,
        avg_factor=jnp.maximum(w.sum(), 1.0))
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)


def tood_get_bboxes(out: TOODHeadOutputs, points, img_hw,
                    scale_factor=None, score_thr: float = 0.05,
                    nms_iou: float = 0.6, nms_pre: int = 1000,
                    max_per_img: int = 100, rescale: bool = False):
    B = out.cls_scores[0].shape[0]
    C = out.cls_scores[0].shape[-1]
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], 1)
    box_flat = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], 1)    # decoded xyxy

    level_sizes = [c.shape[1] * c.shape[2] for c in out.cls_scores]

    def per_image(probs, dist, hw, sf):
        # nms_pre applies PER LEVEL (the reference's
        # _get_bboxes_single loops levels)
        top = filter_scores_and_topk_mlvl(probs, score_thr,
                                          nms_pre, level_sizes)
        boxes = dist[top.keep_idxs]
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
    nb, ns, nl, keep = jax.vmap(per_image)(cls_flat, box_flat, img_hw,
                                           scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=keep)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return TOOD(num_classes=m.num_classes, depth=m.depth,
                    frozen_stages=m.frozen_stages)

    def losses(model, cfg, **_):
        det_cfg = TOODLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            points, anchors, counts = tood_points(
                [c.shape[1:3] for c in out.head.cls_scores])
            return tood_loss(out.head, points, anchors, counts,
                             batch.gt_bboxes, batch.gt_labels,
                             batch.gt_valid, det_cfg, use_tal=True), None
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            points, _, _ = tood_points(
                [c.shape[1:3] for c in out.head.cls_scores])
            d = tood_get_bboxes(out.head, points, img_hw,
                                scale_factor=scale_factors,
                                score_thr=max(score_thr, 0.05),
                                max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("tood", build=build, losses=losses,
                    eval_step=eval_step)


_register()

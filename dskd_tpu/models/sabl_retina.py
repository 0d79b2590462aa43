"""SABL RetinaNet family (parity: mmdet dense_heads/sabl_retina_head.py +
configs/sabl/sabl_retinanet_r50_fpn_1x_coco.py, box AP 37.7).

Side-Aware Boundary Localization on a RetinaNet trunk: ONE square anchor
per cell (scale 4) classified with focal loss; each box side is localized
as a bucket classification (num_buckets=14, scale_factor=3.0 —
core/coders.py bucketing coder) plus a fine within-bucket offset.
Assignment is ApproxMaxIoUAssigner: each cell's 9 octave/ratio "approx"
anchors vote by MAX IoU, then standard MaxIoU rules (0.5/0.4,
low-quality matches kept). Decode rescales scores by the bucketing
confidence (bucket2bbox loc_confidence).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core import losses as L
from ..core.anchors import base_anchors, grid_anchors
from ..core.boxes import bbox_overlaps
from ..core.coders import bbox2bucket, bucket2bbox
from ..core.max_iou_assigner import max_iou_assign_ious
from ..core.postprocess import batched_nms, filter_scores_and_topk, \
    filter_scores_and_topk_mlvl
from .fpn import FPN
from .gfl_detr_head import bias_init_with_prob
from .resnet import ResNet

STRIDES = (8, 16, 32, 64, 128)
NUM_BUCKETS = 14
SCALE_FACTOR = 3.0
SIDE = int(np.ceil(NUM_BUCKETS / 2.0))
APPROX_SCALES = tuple(4 * 2 ** (i / 3) for i in range(3))
APPROX_RATIOS = (0.5, 1.0, 2.0)


class SABLHeadOutputs(NamedTuple):
    cls_scores: Tuple[jnp.ndarray, ...]       # (B, H, W, C)
    bucket_cls: Tuple[jnp.ndarray, ...]       # (B, H, W, 4*side)
    bucket_reg: Tuple[jnp.ndarray, ...]       # (B, H, W, 4*side)


class SABLOutputs(NamedTuple):
    head: SABLHeadOutputs
    neck_feats: Tuple[jnp.ndarray, ...]


class SABLRetinaHead(nn.Module):
    num_classes: int = 80
    stacked_convs: int = 4
    feat_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> SABLHeadOutputs:
        # init parity (sabl_retina_head.py:91-99): all convs
        # Normal(std=0.01), retina_cls bias at prior prob 0.01
        n01 = nn.initializers.normal(0.01)
        convs = {}
        for i in range(self.stacked_convs):
            for p in ("cls", "reg"):
                convs[f"{p}{i}"] = nn.Conv(
                    self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=n01, name=f"{p}_conv{i}")
        retina_cls = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=n01,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="retina_cls")
        bkt_cls = nn.Conv(4 * SIDE, (3, 3), padding=[(1, 1), (1, 1)],
                          kernel_init=n01, name="retina_bbox_cls")
        bkt_reg = nn.Conv(4 * SIDE, (3, 3), padding=[(1, 1), (1, 1)],
                          kernel_init=n01, name="retina_bbox_reg")
        cls_out, bc_out, br_out = [], [], []
        for f in feats:
            c = r = f
            for i in range(self.stacked_convs):
                c = nn.relu(convs[f"cls{i}"](c))
                r = nn.relu(convs[f"reg{i}"](r))
            cls_out.append(retina_cls(c))
            bc_out.append(bkt_cls(r))
            br_out.append(bkt_reg(r))
        return SABLHeadOutputs(tuple(cls_out), tuple(bc_out),
                               tuple(br_out))


class SABLRetinaNet(nn.Module):
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
        head = SABLRetinaHead(num_classes=self.num_classes,
                              name="bbox_head")(neck)
        return SABLOutputs(head, neck)


def sabl_anchors(featmap_sizes):
    """(square anchors (N, 4), approx anchors (N, 9, 4))."""
    sq, ap = [], []
    for (h, w), stride in zip(featmap_sizes, STRIDES):
        sq.append(grid_anchors((h, w), stride,
                               base_anchors(stride, (4,), (1.0,))))
        base = base_anchors(stride, APPROX_SCALES, APPROX_RATIOS)
        ap.append(grid_anchors((h, w), stride, base).reshape(-1, 9, 4))
    return jnp.concatenate(sq, 0), jnp.concatenate(ap, 0)


def approx_max_iou_assign(approxs, gt_bboxes, gt_labels, gt_valid,
                          num_classes: int, pos_thr: float = 0.5,
                          neg_thr: float = 0.4, min_pos_iou: float = 0.0):
    """One image. approxs: (N, 9, 4); each cell votes with its MAX-IoU
    approx (approx_max_iou_assigner.py:108-137), then the standard MaxIoU
    rules via the shared core assigner."""
    N = approxs.shape[0]
    G = gt_bboxes.shape[0]
    ious = bbox_overlaps(approxs.reshape(-1, 4), gt_bboxes)
    ious = ious.reshape(N, 9, G).max(axis=1)                  # (N, G)
    res = max_iou_assign_ious(ious, gt_labels.astype(jnp.int32), gt_valid,
                              num_classes, pos_iou_thr=pos_thr,
                              neg_iou_thr=neg_thr, min_pos_iou=min_pos_iou)
    return res.assigned_gt, res.assigned_gt >= 0, res.labels


class SABLLossConfig(NamedTuple):
    num_classes: int = 80
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    loss_bucket_cls_weight: float = 1.5
    loss_bucket_reg_weight: float = 1.5
    smooth_beta: float = 0.1111


def sabl_loss(out: SABLHeadOutputs, squares, approxs, gt_bboxes,
              gt_labels, gt_valid, cfg: SABLLossConfig
              ) -> Dict[str, jnp.ndarray]:
    B = out.cls_scores[0].shape[0]
    C = cfg.num_classes
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], 1)
    bc_flat = jnp.concatenate(
        [c.reshape(B, -1, 4 * SIDE) for c in out.bucket_cls], 1)
    br_flat = jnp.concatenate(
        [c.reshape(B, -1, 4 * SIDE) for c in out.bucket_reg], 1)
    G = gt_bboxes.shape[1]

    assigned, pos, labels = jax.vmap(
        lambda gb, gl, gv: approx_max_iou_assign(approxs, gb, gl, gv, C))(
        gt_bboxes, gt_labels, gt_valid)
    ignore = assigned == -2
    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

    onehot = jax.nn.one_hot(labels, C + 1)[..., :C]
    wcls = jnp.where(ignore, 0.0, 1.0)
    loss_cls = cfg.loss_cls_weight * L.sigmoid_focal_loss(
        cls_flat.reshape(-1, C), onehot.reshape(-1, C),
        weight=wcls.reshape(-1, 1), avg_factor=num_pos,
        gamma=cfg.focal_gamma, alpha=cfg.focal_alpha)

    safe = jnp.clip(assigned, 0, G - 1)
    tgt = jnp.take_along_axis(gt_bboxes, safe[..., None], axis=1)

    def targets_one(gb):
        return bbox2bucket(squares, gb, NUM_BUCKETS, SCALE_FACTOR)

    offs, ow, blab, bw = jax.vmap(targets_one)(tgt)
    pw = pos.astype(jnp.float32)[..., None]
    loss_bc = cfg.loss_bucket_cls_weight * L.bce_loss(
        bc_flat.reshape(-1), blab.reshape(-1),
        weight=(bw * pw).reshape(-1), avg_factor=num_pos * 4 * SIDE)
    # avg_factor = pos * 4 sides * offset_topk=2 (sabl_retina_head.py:477)
    loss_br = cfg.loss_bucket_reg_weight * L.smooth_l1_loss(
        br_flat.reshape(-1), offs.reshape(-1),
        weight=(ow * pw).reshape(-1), avg_factor=num_pos * 4 * 2,
        beta=cfg.smooth_beta)
    return dict(loss_cls=loss_cls, loss_bbox_cls=loss_bc,
                loss_bbox_reg=loss_br)


def sabl_get_bboxes(out: SABLHeadOutputs, squares, img_hw,
                    scale_factor=None, score_thr: float = 0.05,
                    nms_iou: float = 0.5, nms_pre: int = 1000,
                    max_per_img: int = 100, rescale: bool = False):
    B = out.cls_scores[0].shape[0]
    C = out.cls_scores[0].shape[-1]
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], 1)
    bc_flat = jnp.concatenate(
        [c.reshape(B, -1, 4 * SIDE) for c in out.bucket_cls], 1)
    br_flat = jnp.concatenate(
        [c.reshape(B, -1, 4 * SIDE) for c in out.bucket_reg], 1)

    level_sizes = [c.shape[1] * c.shape[2] for c in out.cls_scores]

    def per_image(cls_s, bc, br, hw, sf):
        boxes, conf = bucket2bbox(squares, bc, br, NUM_BUCKETS,
                                  SCALE_FACTOR)
        probs = jax.nn.sigmoid(cls_s) * conf[:, None]   # loc rescoring
        # nms_pre applies PER LEVEL (the reference's
        # _get_bboxes_single loops levels)
        top = filter_scores_and_topk_mlvl(probs, score_thr,
                                          nms_pre, level_sizes)
        bsel = boxes[top.keep_idxs]
        h, w = hw[0].astype(bsel.dtype), hw[1].astype(bsel.dtype)
        bsel = jnp.stack([
            jnp.clip(bsel[:, 0], 0, w), jnp.clip(bsel[:, 1], 0, h),
            jnp.clip(bsel[:, 2], 0, w), jnp.clip(bsel[:, 3], 0, h)], -1)
        nb, ns, nl, keep, _ = batched_nms(bsel, top.scores, top.labels,
                                          nms_iou, max_per_img,
                                          valid=top.valid)
        if rescale and sf is not None:
            nb = nb / sf[None]
        return nb, ns, nl, keep

    if scale_factor is None:
        scale_factor = jnp.ones((B, 4), jnp.float32)
    nb, ns, nl, keep = jax.vmap(per_image)(cls_flat, bc_flat, br_flat,
                                           img_hw, scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=keep)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return SABLRetinaNet(num_classes=m.num_classes, depth=m.depth,
                             frozen_stages=m.frozen_stages)

    def losses(model, cfg, **_):
        det_cfg = SABLLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            squares, approxs = sabl_anchors(
                [c.shape[1:3] for c in out.head.cls_scores])
            return sabl_loss(out.head, squares, approxs, batch.gt_bboxes,
                             batch.gt_labels, batch.gt_valid,
                             det_cfg), None
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            squares, _ = sabl_anchors(
                [c.shape[1:3] for c in out.head.cls_scores])
            d = sabl_get_bboxes(out.head, squares, img_hw,
                                scale_factor=scale_factors,
                                score_thr=max(score_thr, 0.05),
                                max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("sabl_retina", build=build, losses=losses,
                    eval_step=eval_step)


_register()

"""FoveaBox family (parity: mmdet dense_heads/fovea_head.py +
configs/foveabox/fovea_r50_fpn_4x4_1x_coco.py, box AP 36.5).

Anchor-free per-point prediction with scale-based level assignment:
  * a GT lands on the pyramid level(s) whose scale range contains
    sqrt(area); its POSITIVE region is the sigma=0.4-shrunk box (fovea);
  * bbox targets are log-encoded offsets of the cell center to the box
    sides, normalized by the level's base_edge; predictions decode with
    exp (clamped), trained with SmoothL1 on the log domain;
  * classification is sigmoid focal over all points.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core import losses as L
from ..core.postprocess import batched_nms, filter_scores_and_topk, \
    filter_scores_and_topk_mlvl
from .fpn import FPN
from .gfl_detr_head import bias_init_with_prob
from .resnet import ResNet

STRIDES = (8, 16, 32, 64, 128)
BASE_EDGES = (16, 32, 64, 128, 256)
SCALE_RANGES = ((1, 64), (32, 128), (64, 256), (128, 512), (256, 2048))
SIGMA = 0.4


class FoveaHeadOutputs(NamedTuple):
    cls_scores: Tuple[jnp.ndarray, ...]   # (B, H, W, C)
    bbox_preds: Tuple[jnp.ndarray, ...]   # (B, H, W, 4) log-encoded


class FoveaOutputs(NamedTuple):
    head: FoveaHeadOutputs
    neck_feats: Tuple[jnp.ndarray, ...]


class FoveaHead(nn.Module):
    num_classes: int = 80
    stacked_convs: int = 4
    feat_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> FoveaHeadOutputs:
        # init parity (fovea_head.py:64-67): head convs Normal(std=0.01),
        # conv_cls bias at prior prob 0.01
        n01 = nn.initializers.normal(0.01)
        convs = {}
        for i in range(self.stacked_convs):
            for p in ("cls", "reg"):
                convs[f"{p}{i}"] = nn.Conv(
                    self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=n01, name=f"{p}_conv{i}")
                convs[f"{p}{i}_gn"] = nn.GroupNorm(
                    epsilon=1e-5, num_groups=32, name=f"{p}_gn{i}")
        conv_cls = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=n01,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="conv_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                           kernel_init=n01, name="conv_reg")
        cls_out, reg_out = [], []
        for f in feats:
            c = r = f
            for i in range(self.stacked_convs):
                c = nn.relu(convs[f"cls{i}_gn"](convs[f"cls{i}"](c)))
                r = nn.relu(convs[f"reg{i}_gn"](convs[f"reg{i}"](r)))
            cls_out.append(conv_cls(c))
            reg_out.append(conv_reg(r))
        return FoveaHeadOutputs(tuple(cls_out), tuple(reg_out))


class FoveaBox(nn.Module):
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
        head = FoveaHead(num_classes=self.num_classes,
                         name="bbox_head")(neck)
        return FoveaOutputs(head, neck)


def _level_targets(h, w, stride, base, lo, hi, gt_bboxes, gt_labels,
                   gt_valid, num_classes):
    """One image, one level: labels (h*w,), log bbox targets (h*w, 4),
    pos mask. Smaller-area GTs written LAST win overlaps (reference sorts
    by descending area and writes sequentially)."""
    G = gt_bboxes.shape[0]
    areas = jnp.sqrt(jnp.clip(
        (gt_bboxes[:, 2] - gt_bboxes[:, 0])
        * (gt_bboxes[:, 3] - gt_bboxes[:, 1]), 0, None))
    in_range = (areas >= lo) & (areas <= hi) & gt_valid

    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride   # cell centers
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
    cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2
    cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2
    gw = gt_bboxes[:, 2] - gt_bboxes[:, 0]
    gh = gt_bboxes[:, 3] - gt_bboxes[:, 1]
    # fovea (shrunk) region
    x1s = cx - SIGMA * gw / 2
    x2s = cx + SIGMA * gw / 2
    y1s = cy - SIGMA * gh / 2
    y2s = cy + SIGMA * gh / 2
    inside = ((xs[None, None, :] >= x1s[:, None, None])
              & (xs[None, None, :] <= x2s[:, None, None])
              & (ys[None, :, None] >= y1s[:, None, None])
              & (ys[None, :, None] <= y2s[:, None, None])
              & in_range[:, None, None])                     # (G, h, w)

    # priority: larger-area first so SMALLER boxes overwrite
    order = jnp.argsort(-jnp.where(in_range, areas, -1.0))
    rank = jnp.zeros((G,), jnp.int32).at[order].set(
        jnp.arange(1, G + 1, dtype=jnp.int32))
    best = jnp.argmax(inside * rank[:, None, None], axis=0)  # (h, w)
    pos = inside.any(axis=0)
    labels = jnp.where(pos, gt_labels[best], num_classes).reshape(-1)

    bx = jnp.take(gt_bboxes, best.reshape(-1), axis=0)       # (hw, 4)
    px = jnp.tile(xs[None, :], (h, 1)).reshape(-1)
    py = jnp.repeat(ys, w)
    t = jnp.stack([
        (px - bx[:, 0]) / base, (py - bx[:, 1]) / base,
        (bx[:, 2] - px) / base, (bx[:, 3] - py) / base], -1)
    # clamp(1/16, 16) BEFORE log (fovea_head.py:266-268); the clamp floor
    # keeps the log finite, no epsilon needed
    t = jnp.log(jnp.clip(t, 1.0 / 16, 16.0))
    return labels, t, pos.reshape(-1)


class FoveaLossConfig(NamedTuple):
    num_classes: int = 80
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    # fovea config: SmoothL1Loss(beta=0.11, loss_weight=1.0)
    loss_bbox_weight: float = 1.0
    smooth_beta: float = 0.11


def fovea_loss(out: FoveaHeadOutputs, gt_bboxes, gt_labels, gt_valid,
               cfg: FoveaLossConfig) -> Dict[str, jnp.ndarray]:
    B = out.cls_scores[0].shape[0]
    C = cfg.num_classes
    all_labels, all_t, all_pos, all_cls, all_reg = [], [], [], [], []
    for lvl, (cs, rs) in enumerate(zip(out.cls_scores, out.bbox_preds)):
        h, w = cs.shape[1:3]
        lab, t, pos = jax.vmap(
            lambda b, l, v: _level_targets(
                h, w, STRIDES[lvl], BASE_EDGES[lvl],
                SCALE_RANGES[lvl][0], SCALE_RANGES[lvl][1], b, l, v, C))(
            gt_bboxes, gt_labels, gt_valid)
        all_labels.append(lab)
        all_t.append(t)
        all_pos.append(pos)
        all_cls.append(cs.reshape(B, -1, C))
        all_reg.append(rs.reshape(B, -1, 4))
    labels = jnp.concatenate(all_labels, 1)
    t = jnp.concatenate(all_t, 1)
    pos = jnp.concatenate(all_pos, 1)
    cls_flat = jnp.concatenate(all_cls, 1)
    reg_flat = jnp.concatenate(all_reg, 1)

    num_pos = pos.sum().astype(jnp.float32)
    onehot = jax.nn.one_hot(labels, C + 1)[..., :C]
    # fovea_head.py:167-178: cls avg = num_pos + num_imgs; bbox is
    # SmoothL1 summed over the (P, 4) elements / num_pos
    loss_cls = cfg.loss_cls_weight * L.sigmoid_focal_loss(
        cls_flat.reshape(-1, C), onehot.reshape(-1, C),
        avg_factor=num_pos + B, gamma=cfg.focal_gamma,
        alpha=cfg.focal_alpha)
    w = jnp.repeat(pos.astype(jnp.float32)[..., None], 4, -1).reshape(-1, 4)
    loss_bbox = cfg.loss_bbox_weight * L.smooth_l1_loss(
        reg_flat.reshape(-1, 4), t.reshape(-1, 4), weight=w,
        beta=cfg.smooth_beta, avg_factor=jnp.maximum(num_pos, 1.0))
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)


def fovea_get_bboxes(out: FoveaHeadOutputs, img_hw, scale_factor=None,
                     score_thr: float = 0.05, nms_iou: float = 0.5,
                     nms_pre: int = 1000, max_per_img: int = 100,
                     rescale: bool = False):
    B = out.cls_scores[0].shape[0]
    C = out.cls_scores[0].shape[-1]
    boxes_all, cls_all = [], []
    for lvl, (cs, rs) in enumerate(zip(out.cls_scores, out.bbox_preds)):
        h, w = cs.shape[1:3]
        stride, base = STRIDES[lvl], BASE_EDGES[lvl]
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
        px = jnp.tile(xs[None, :], (h, 1)).reshape(-1)
        py = jnp.repeat(ys, w)
        d = jnp.exp(rs.reshape(B, -1, 4)) * base
        boxes = jnp.stack([px[None] - d[..., 0], py[None] - d[..., 1],
                           px[None] + d[..., 2], py[None] + d[..., 3]], -1)
        boxes_all.append(boxes)
        cls_all.append(cs.reshape(B, -1, C))
    boxes_flat = jnp.concatenate(boxes_all, 1)
    cls_flat = jnp.concatenate(cls_all, 1)

    level_sizes = [c.shape[1] * c.shape[2] for c in out.cls_scores]

    def per_image(cls_s, bx, hw, sf):
        probs = jax.nn.sigmoid(cls_s)
        # nms_pre applies PER LEVEL (the reference's
        # _get_bboxes_single loops levels)
        top = filter_scores_and_topk_mlvl(probs, score_thr,
                                          nms_pre, level_sizes)
        bsel = bx[top.keep_idxs]
        # _bbox_decode clamps to max_shape - 1 (fovea_head.py:364-370)
        h = hw[0].astype(bsel.dtype) - 1
        w = hw[1].astype(bsel.dtype) - 1
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
    nb, ns, nl, keep = jax.vmap(per_image)(cls_flat, boxes_flat, img_hw,
                                           scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=keep)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return FoveaBox(num_classes=m.num_classes, depth=m.depth,
                        frozen_stages=m.frozen_stages)

    def losses(model, cfg, **_):
        det_cfg = FoveaLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            return fovea_loss(out.head, batch.gt_bboxes, batch.gt_labels,
                              batch.gt_valid, det_cfg), None
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            d = fovea_get_bboxes(out.head, img_hw,
                                 scale_factor=scale_factors,
                                 score_thr=max(score_thr, 0.05),
                                 max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("foveabox", build=build, losses=losses,
                    eval_step=eval_step)


_register()

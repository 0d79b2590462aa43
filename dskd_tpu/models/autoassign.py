"""AutoAssign family (parity: mmdet dense_heads/autoassign_head.py +
configs/autoassign/autoassign_r50_fpn_8x2_1x_coco.py, box AP 40.4).

Fully differentiable label assignment:
  * a learnable per-class CenterPrior (mean/sigma per coordinate, in
    stride units) gates each (point, gt) pair inside the gt box;
  * positive loss: joint confidence p_pos = sigmoid(cls)*sigmoid(obj) *
    exp(-giou_loss); per gt, points are re-weighted by
    softmax-like exp(3*p_pos)*prior and the weighted confidence trained
    toward 1 (BCE), summed / total num_gt (weight 0.25);
  * negative loss: every (point, class) starts as a negative with weight
    1; inside-gt points of the gt's class get weight 1 - normalize(1/(1 -
    iou)) (per-gt min-max normalization, max-over-gt ious); focal-like
    (w*conf)^2 * BCE(w*conf, 0), summed / sum(center priors) (weight
    0.75);
  * center loss: num_gt / sum(prior) per image, mean * 0.75 — pulls the
    learnable prior toward covering its instances.

Head = FCOS towers; reg = clamp(scale(conv), 0) * stride; objectness on
the reg branch. Static shapes: padded GT loop for the negative-weight
scatter (later gts overwrite, matching the reference's sequential
writes).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.boxes import bbox_overlaps, distance2bbox
from ..core.postprocess import batched_nms, filter_scores_and_topk, \
    filter_scores_and_topk_mlvl
from .fcos import Scale
from .fpn import FPN
from .gfl_detr_head import bias_init_with_prob
from .resnet import ResNet

STRIDES = (8, 16, 32, 64, 128)
EPS = 1e-12


class AutoAssignHeadOutputs(NamedTuple):
    cls_scores: Tuple[jnp.ndarray, ...]   # (B, H, W, C)
    bbox_preds: Tuple[jnp.ndarray, ...]   # (B, H, W, 4) image-space ltrb
    objectness: Tuple[jnp.ndarray, ...]   # (B, H, W, 1)


class AutoAssignOutputs(NamedTuple):
    head: AutoAssignHeadOutputs
    neck_feats: Tuple[jnp.ndarray, ...]
    prior_mean: jnp.ndarray               # (C, 2)
    prior_sigma: jnp.ndarray              # (C, 2)


class AutoAssignHead(nn.Module):
    num_classes: int = 80
    stacked_convs: int = 4
    feat_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]
                 ) -> AutoAssignHeadOutputs:
        # init parity (autoassign_head.py:173-177 + FCOS scheme): all
        # convs Normal(std=0.01)
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
            # autoassign_head.py:175: prior prob 0.02, not the usual 0.01
            bias_init=nn.initializers.constant(bias_init_with_prob(0.02)),
            name="conv_cls")
        conv_reg = nn.Conv(
            4, (3, 3), padding=[(1, 1), (1, 1)], kernel_init=n01,
            # reference init: reg bias 4.0 so boxes start non-degenerate
            bias_init=nn.initializers.constant(4.0), name="conv_reg")
        conv_obj = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                           kernel_init=n01, name="conv_objectness")
        cls_out, reg_out, obj_out = [], [], []
        for lvl, f in enumerate(feats):
            c = r = f
            for i in range(self.stacked_convs):
                c = nn.relu(convs[f"cls{i}_gn"](convs[f"cls{i}"](c)))
                r = nn.relu(convs[f"reg{i}_gn"](convs[f"reg{i}"](r)))
            cls_out.append(conv_cls(c))
            obj_out.append(conv_obj(r))
            d = jnp.clip(Scale(name=f"scale{lvl}")(conv_reg(r)), 0)
            reg_out.append(d * STRIDES[lvl])
        return AutoAssignHeadOutputs(tuple(cls_out), tuple(reg_out),
                                     tuple(obj_out))


class AutoAssign(nn.Module):
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
        head = AutoAssignHead(num_classes=self.num_classes,
                              name="bbox_head")(neck)
        mean = self.param("center_prior_mean", nn.initializers.zeros,
                          (self.num_classes, 2))
        sigma = self.param("center_prior_sigma", nn.initializers.ones,
                           (self.num_classes, 2))
        return AutoAssignOutputs(head, neck, mean, sigma)


def autoassign_points(featmap_sizes):
    """Grid priors with offset 0 (MlvlPointGenerator(offset=0))."""
    pts, strides = [], []
    for (h, w), s in zip(featmap_sizes, STRIDES):
        ys, xs = np.mgrid[:h, :w]
        pts.append(np.stack([xs * s, ys * s], -1).reshape(-1, 2))
        strides.append(np.full((h * w,), s, np.float32))
    return (jnp.asarray(np.concatenate(pts), jnp.float32),
            jnp.asarray(np.concatenate(strides)))


class AutoAssignLossConfig(NamedTuple):
    num_classes: int = 80
    pos_loss_weight: float = 0.25
    neg_loss_weight: float = 0.75
    center_loss_weight: float = 0.75
    giou_weight: float = 5.0


def autoassign_loss(out: AutoAssignHeadOutputs, prior_mean, prior_sigma,
                    gt_bboxes, gt_labels, gt_valid,
                    cfg: AutoAssignLossConfig) -> Dict[str, jnp.ndarray]:
    B = out.cls_scores[0].shape[0]
    C = cfg.num_classes
    G = gt_bboxes.shape[1]
    points, strides = autoassign_points(
        [c.shape[1:3] for c in out.cls_scores])
    N = points.shape[0]
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], 1)
    reg_flat = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], 1)
    obj_flat = jnp.concatenate(
        [o.reshape(B, -1) for o in out.objectness], 1)

    def per_image(cls_s, dist, obj, gb, gl, gv):
        safe_lbl = jnp.clip(gl, 0, C - 1)
        inside = ((points[:, 0][:, None] > gb[None, :, 0])
                  & (points[:, 0][:, None] < gb[None, :, 2])
                  & (points[:, 1][:, None] > gb[None, :, 1])
                  & (points[:, 1][:, None] < gb[None, :, 3])
                  & gv[None])                               # (N, G)
        # learnable center prior, per (point, gt), stride units
        gcx = (gb[:, 0] + gb[:, 2]) / 2
        gcy = (gb[:, 1] + gb[:, 3]) / 2
        mu = prior_mean[safe_lbl]                           # (G, 2)
        sg = prior_sigma[safe_lbl]
        dx = ((points[:, 0][:, None] - gcx[None]) / strides[:, None]
              - mu[None, :, 0]) ** 2
        dy = ((points[:, 1][:, None] - gcy[None]) / strides[:, None]
              - mu[None, :, 1]) ** 2
        prior = (jnp.exp(-dx / (2 * sg[None, :, 0] ** 2))
                 * jnp.exp(-dy / (2 * sg[None, :, 1] ** 2)))
        prior = jnp.where(inside, prior, 0.0)               # (N, G)

        boxes = distance2bbox(points, dist)                 # (N, 4)
        giou = 1 - bbox_overlaps(boxes, gb, mode="giou")    # (N, G)
        reg_loss = cfg.giou_weight * giou
        p_loc = jnp.exp(-reg_loss)
        conf = jax.nn.sigmoid(cls_s) * jax.nn.sigmoid(obj)[:, None]
        p_cls = conf[:, safe_lbl]                           # (N, G)
        p_pos = p_cls * p_loc

        cw = jnp.exp(p_pos * 3) * prior
        w = cw / jnp.clip(cw.sum(0, keepdims=True), EPS)
        rew = (p_pos * w).sum(0)                            # (G,)
        pos_bce = -jnp.log(jnp.clip(rew, EPS))
        pos_loss = (jnp.where(gv, pos_bce, 0.0)).sum() \
            * cfg.pos_loss_weight

        # negatives: iou-suppressed weights at (inside point, gt class)
        ious = jax.lax.stop_gradient(
            bbox_overlaps(boxes, gb, is_aligned=False))
        ious = jnp.where(gv[None], ious, 0.0)
        iou_max = ious.max(1, keepdims=True)
        ious = jnp.where(inside, jnp.broadcast_to(iou_max, (N, G)), 0.0)
        tw = 1.0 / jnp.clip(1.0 - ious, EPS)                # (N, G)
        # per-gt min-max normalization over ITS inside points
        big = 1e12
        tmin = jnp.where(inside, tw, big).min(0)
        tmax = jnp.where(inside, tw, -big).max(0)
        tw = (tw - tmin[None] + EPS) / (tmax[None] - tmin[None] + EPS)
        w_neg = jnp.ones((N, C))
        for g in range(G):                      # later gts overwrite
            colmask = jax.nn.one_hot(safe_lbl[g], C)[None]  # (1, C)
            upd = jnp.where(inside[:, g], 1.0 - tw[:, g], jnp.nan)
            w_neg = jnp.where((colmask > 0) & ~jnp.isnan(upd)[:, None],
                              upd[:, None], w_neg)
        logits = conf * w_neg
        neg = (logits ** 2) * (-jnp.log(jnp.clip(1 - logits, EPS)))
        neg_loss = neg.sum() * cfg.neg_loss_weight

        has_inside = inside.any()
        center = jnp.where(
            has_inside,
            gv.sum().astype(jnp.float32) / jnp.clip(prior.sum(), EPS),
            prior.sum() * 0.0)
        return pos_loss, neg_loss, center, prior.sum()

    pos, neg, center, prior_sums = jax.vmap(per_image)(
        cls_flat, reg_flat, obj_flat, gt_bboxes, gt_labels, gt_valid)
    num_gt = jnp.maximum(gt_valid.sum().astype(jnp.float32), 1.0)
    return dict(
        loss_pos=pos.sum() / num_gt,
        loss_neg=neg.sum() / jnp.maximum(prior_sums.sum(), 1.0),
        loss_center=center.mean() * cfg.center_loss_weight)


def autoassign_get_bboxes(out: AutoAssignHeadOutputs, img_hw,
                          scale_factor=None, score_thr: float = 0.05,
                          nms_iou: float = 0.6, nms_pre: int = 1000,
                          max_per_img: int = 100, rescale: bool = False):
    B = out.cls_scores[0].shape[0]
    C = out.cls_scores[0].shape[-1]
    points, _ = autoassign_points(
        [c.shape[1:3] for c in out.cls_scores])
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], 1)
    reg_flat = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], 1)
    obj_flat = jnp.concatenate(
        [o.reshape(B, -1) for o in out.objectness], 1)

    level_sizes = [c.shape[1] * c.shape[2] for c in out.cls_scores]

    def per_image(cls_s, dist, obj, hw, sf):
        probs = jax.nn.sigmoid(cls_s) * jax.nn.sigmoid(obj)[:, None]
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
    nb, ns, nl, keep = jax.vmap(per_image)(cls_flat, reg_flat, obj_flat,
                                           img_hw, scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=keep)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return AutoAssign(num_classes=m.num_classes, depth=m.depth,
                          frozen_stages=m.frozen_stages)

    def losses(model, cfg, **_):
        det_cfg = AutoAssignLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            return autoassign_loss(
                out.head, out.prior_mean, out.prior_sigma, batch.gt_bboxes,
                batch.gt_labels, batch.gt_valid, det_cfg), None
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            d = autoassign_get_bboxes(out.head, img_hw,
                                      scale_factor=scale_factors,
                                      score_thr=max(score_thr, 0.05),
                                      max_per_img=max_per_img,
                                      rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("autoassign", build=build, losses=losses,
                    eval_step=eval_step)


_register()

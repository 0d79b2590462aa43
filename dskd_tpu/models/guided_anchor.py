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
from ..core.max_iou_assigner import max_iou_assign, max_iou_assign_ious
from ..core.postprocess import batched_nms, filter_scores_and_topk, \
    filter_scores_and_topk_mlvl
from ..ops.deform_conv import deform_conv2d
from .fpn import FPN
from .gfl_detr_head import bias_init_with_prob
from .resnet import ResNet

STRIDES = (8, 16, 32, 64, 128)        # GA-Retina (FPN start_level=1)
GARPN_STRIDES = (4, 8, 16, 32, 64)    # GA-RPN (FPN start_level=0)
OCTAVE_SCALE = 4                       # GA-Retina octave_base_scale
GARPN_OCTAVE_SCALE = 8                 # GA-RPN octave_base_scale
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
        # init parity (ga_retina_head.py:23-41 + guided_anchor_head.py
        # FeatureAdaption:36-41): every conv Normal(std=0.01) incl.
        # conv_shape; conv_loc/retina_cls bias at prior prob 0.01; the
        # adaption offset conv Normal(std=0.1), no bias
        n01 = nn.initializers.normal(0.01)
        convs = {}
        for i in range(self.stacked_convs):
            for p in ("cls", "reg"):
                convs[f"{p}{i}"] = nn.Conv(
                    C, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=n01, name=f"{p}_conv{i}")
        conv_loc = nn.Conv(
            1, (1, 1), kernel_init=n01,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="conv_loc")
        conv_shape = nn.Conv(2, (1, 1), kernel_init=n01,
                             bias_init=nn.initializers.zeros,
                             name="conv_shape")
        offset_cls = nn.Conv(18, (1, 1),
                             kernel_init=nn.initializers.normal(0.1),
                             use_bias=False, name="cls_adaption_offset")
        offset_reg = nn.Conv(18, (1, 1),
                             kernel_init=nn.initializers.normal(0.1),
                             use_bias=False, name="reg_adaption_offset")
        w_cls_ad = self.param("cls_adaption_kernel",
                              nn.initializers.normal(0.01), (3, 3, C, C))
        w_reg_ad = self.param("reg_adaption_kernel",
                              nn.initializers.normal(0.01), (3, 3, C, C))
        retina_cls = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=n01,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="ga_retina_cls")
        retina_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                             kernel_init=n01, name="ga_retina_reg")

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
        # init parity: same scheme as GAHead (Normal 0.01 convs, prior-
        # prob biases on loc/cls, Normal 0.1 bias-free offset conv)
        n01 = nn.initializers.normal(0.01)
        rpn_conv = nn.Conv(C, (3, 3), padding=[(1, 1), (1, 1)],
                           kernel_init=n01, name="rpn_conv")
        conv_loc = nn.Conv(
            1, (1, 1), kernel_init=n01,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="conv_loc")
        conv_shape = nn.Conv(2, (1, 1), kernel_init=n01,
                             bias_init=nn.initializers.zeros,
                             name="conv_shape")
        offset = nn.Conv(18, (1, 1),
                         kernel_init=nn.initializers.normal(0.1),
                         use_bias=False, name="adaption_offset")
        w_ad = self.param("adaption_kernel",
                          nn.initializers.normal(0.01), (3, 3, C, C))
        conv_cls = nn.Conv(
            1, (1, 1), kernel_init=n01,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="conv_cls")
        conv_reg = nn.Conv(4, (1, 1), kernel_init=n01, name="conv_reg")

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


def ga_geometry(featmap_sizes, level_strides=STRIDES,
                octave_scale: int = OCTAVE_SCALE):
    """(centers (N, 2), strides (N,), approxs (N, 9, 4), counts).

    GA-Retina: strides (8..128), octave_base_scale 4; GA-RPN: strides
    (4..64), octave_base_scale 8 (each variant's approx + square anchor
    generators, configs/guided_anchoring)."""
    approx_scales = tuple(octave_scale * 2 ** (i / 3) for i in range(3))
    pts, strides, ap, counts = [], [], [], []
    for (h, w), s in zip(featmap_sizes, level_strides):
        ys, xs = np.mgrid[:h, :w]
        pts.append(np.stack([(xs + 0.5) * s, (ys + 0.5) * s],
                            -1).reshape(-1, 2))
        strides.append(np.full((h * w,), s, np.float32))
        base = base_anchors(s, approx_scales, APPROX_RATIOS)
        ap.append(grid_anchors((h, w), s, base).reshape(-1, 9, 4))
        counts.append(h * w)
    return (jnp.asarray(np.concatenate(pts), jnp.float32),
            jnp.asarray(np.concatenate(strides)),
            jnp.concatenate(ap, 0), tuple(counts))


def guided_anchors(centers, strides, shape_flat,
                   sigma: float = float(OCTAVE_SCALE),
                   shape_std: float = 1.0):
    """(B, N, 4) anchors from predicted (dw, dh): the anchor_coder decode
    of square (sigma*stride) anchors with deltas (0, 0, dw, dh) —
    wh = sigma * stride * exp(std * d)."""
    wh = sigma * strides[None, :, None] \
        * jnp.exp(jnp.clip(shape_flat * shape_std, -4.0, 4.0))
    return jnp.concatenate([centers[None] - wh / 2,
                            centers[None] + wh / 2], -1)


class GALossConfig(NamedTuple):
    """Per-variant GA training recipe (configs/guided_anchoring).

    Defaults are GA-Retina (ga_retinanet_r50_fpn_1x_coco.py); GA-RPN
    (ga_rpn_r50_fpn_1x_coco.py) overrides: num_classes=1, focal_cls=False
    (sigmoid CE + 256@0.5 sampling), anchor_sigma=8 with strides (4..64),
    shape_std=0.14, bbox_stds=(0.07, 0.07, 0.11, 0.11), ga thresholds
    0.7/0.3/0.3, head thresholds 0.7/0.3/0.3, smooth_beta=1.0."""
    num_classes: int = 80
    focal_cls: bool = True          # False => sigmoid CE + head sampling
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_loc_weight: float = 1.0
    loss_shape_weight: float = 1.0
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.0
    smooth_beta: float = 0.04       # SmoothL1 beta (rpn: 1.0)
    # geometry (must match the ga_geometry/guided_anchors call)
    strides: Tuple[int, ...] = STRIDES
    octave_scale: int = OCTAVE_SCALE
    anchor_sigma: float = float(OCTAVE_SCALE)   # square anchor scale
    shape_std: float = 1.0          # anchor_coder wh std (rpn: 0.14)
    bbox_stds: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    # ApproxMaxIoU (shape branch) assigner
    ga_pos: float = 0.5
    ga_neg: float = 0.4
    ga_min_pos: float = 0.4
    # head (guided-anchor) assigner
    pos_iou: float = 0.5
    neg_iou: float = 0.5
    min_pos_iou: float = 0.0
    sample_num: int = 256           # ga_sampler (and rpn head sampler)
    pos_fraction: float = 0.5


def _sampled_masks(rng, assigned_gt, num: int, pos_fraction: float):
    """RandomSampler as (pos_mask, neg_mask) over all N anchors: up to
    num*pos_fraction positives, negatives fill to num total (the
    reference samples num - len(pos) negatives)."""
    N = assigned_gt.shape[0]
    num_pos_max = int(num * pos_fraction)
    r1, r2 = jax.random.split(rng)
    pos_keys = jnp.where(assigned_gt >= 0,
                         jax.random.uniform(r1, (N,)), -1.0)
    k = min(num_pos_max, N)
    pv, pi = jax.lax.top_k(pos_keys, k)
    pos_mask = jnp.zeros((N,), bool).at[pi].set(pv > 0)
    n_pos = pos_mask.sum()
    neg_keys = jnp.where(assigned_gt == -1,
                         jax.random.uniform(r2, (N,)), -1.0)
    kn = min(num, N)
    nv, ni = jax.lax.top_k(neg_keys, kn)
    want = (jnp.arange(kn) < (num - n_pos)) & (nv > 0)
    neg_mask = jnp.zeros((N,), bool).at[ni].set(want)
    return pos_mask, neg_mask


def ga_loss(out: GAHeadOutputs, centers, strides, approxs, level_counts,
            gt_bboxes, gt_labels, gt_valid, cfg: GALossConfig,
            rng=None) -> Dict[str, jnp.ndarray]:
    """guided_anchor_head.py:384-752 loss under static shapes.

    * loc branch: focal loss on level-routed center regions
      (ga_loc_targets: target level floor(log2(scale/(octave*stride0)) +
      0.5); pos = central 0.2 region, ignore = 0.5 ring + adjacent-level
      0.5 regions, negatives weighted 0.1, avg = cells/200). Cell
      membership reproduces calc_region's rounded-slice arithmetic.
      One deviation from the reference's in-place writes: overlapping
      gts resolve order-independently (pos wins over ignore).
    * shape branch: ApproxMaxIoUAssigner (max over the 9 approxes ->
      full MaxIoU semantics) + RandomSampler 256@0.5; bounded IoU loss
      on the decoded square anchors, avg = sampled total (fg+bg,
      ga_sampling=True in both shipped configs).
    * head: MaxIoU on the detached guided anchors; focal (retina,
      avg=num_pos) or sampled sigmoid CE (rpn, avg=256*B); SmoothL1 on
      bbox_coder deltas, same avg (the (N,4) sum / num_total_samples —
      NOT 4x)."""
    B = out.cls_scores[0].shape[0]
    C = cfg.num_classes
    N = centers.shape[0]
    G = gt_bboxes.shape[1]
    L_n = len(level_counts)
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], 1)
    reg_flat = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], 1)
    loc_flat = jnp.concatenate(
        [r.reshape(B, -1) for r in out.loc_preds], 1)
    shape_flat = jnp.concatenate(
        [r.reshape(B, -1, 2) for r in out.shape_preds], 1)
    anchors = guided_anchors(centers, strides, shape_flat,
                             sigma=cfg.anchor_sigma,
                             shape_std=cfg.shape_std)         # (B, N, 4)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    # per-cell integer col/row index + level id (static geometry)
    cell_ix = centers[:, 0] / strides - 0.5
    cell_iy = centers[:, 1] / strides - 0.5
    level_id = jnp.repeat(
        jnp.arange(L_n), jnp.asarray(level_counts),
        total_repeat_length=N)
    lvl_strides = jnp.asarray(cfg.strides, jnp.float32)

    r1 = (1.0 - CENTER_RATIO) / 2.0
    r2 = (1.0 - IGNORE_RATIO) / 2.0

    def regions(gb, ratio, stride_per_gt):
        """calc_region in cell units at each gt's own level: rounded
        inclusive [x1, x2] x [y1, y2] (N, G) membership."""
        g = gb / stride_per_gt[:, None]                       # (G, 4)
        x1 = jnp.round((1 - ratio) * g[:, 0] + ratio * g[:, 2])
        y1 = jnp.round((1 - ratio) * g[:, 1] + ratio * g[:, 3])
        x2 = jnp.round(ratio * g[:, 0] + (1 - ratio) * g[:, 2])
        y2 = jnp.round(ratio * g[:, 1] + (1 - ratio) * g[:, 3])
        return ((cell_ix[:, None] >= x1[None])
                & (cell_ix[:, None] <= x2[None])
                & (cell_iy[:, None] >= y1[None])
                & (cell_iy[:, None] <= y2[None]))

    min_anchor = float(cfg.octave_scale * cfg.strides[0])

    def per_image_loc(gb, gv):
        scale = jnp.sqrt(jnp.clip((gb[:, 2] - gb[:, 0])
                                  * (gb[:, 3] - gb[:, 1]), 1e-6))
        lvl_g = jnp.clip(jnp.floor(jnp.log2(scale / min_anchor) + 0.5),
                         0, L_n - 1).astype(jnp.int32)        # (G,)
        s_g = lvl_strides[lvl_g]
        same = (level_id[:, None] == lvl_g[None]) & gv[None]
        pos = (regions(gb, r1, s_g) & same).any(1)
        ign = (regions(gb, r2, s_g) & same).any(1)
        # adjacent-level ignore maps
        lo = jnp.clip(lvl_g - 1, 0, L_n - 1)
        hi = jnp.clip(lvl_g + 1, 0, L_n - 1)
        adj = ((regions(gb, r2, lvl_strides[lo])
                & (level_id[:, None] == lo[None]) & (lvl_g > 0)[None]
                & gv[None])
               | (regions(gb, r2, lvl_strides[hi])
                  & (level_id[:, None] == hi[None])
                  & (lvl_g < L_n - 1)[None] & gv[None])).any(1)
        w = jnp.where(pos, 1.0, jnp.where(ign | adj, 0.0, 0.1))
        return pos, w

    pos_loc, w_loc = jax.vmap(per_image_loc)(gt_bboxes, gt_valid)
    loc_avg = B * N / 200.0
    loss_loc = cfg.loss_loc_weight * L.sigmoid_focal_loss(
        loc_flat.reshape(-1, 1),
        pos_loc.astype(jnp.float32).reshape(-1, 1),
        weight=w_loc.reshape(-1, 1), avg_factor=loc_avg,
        gamma=cfg.focal_gamma, alpha=cfg.focal_alpha)

    # --- shape targets: ApproxMaxIoU + RandomSampler ---
    def per_image_shape(r, anc, gb, gl, gv):
        ious = bbox_overlaps(approxs.reshape(-1, 4), gb)
        ious = ious.reshape(N, 9, G).max(1)
        res = max_iou_assign_ious(ious, gl, gv, C,
                                  pos_iou_thr=cfg.ga_pos,
                                  neg_iou_thr=cfg.ga_neg,
                                  min_pos_iou=cfg.ga_min_pos)
        pos_m, _ = _sampled_masks(r, res.assigned_gt, cfg.sample_num,
                                  cfg.pos_fraction)
        safe = jnp.clip(res.assigned_gt, 0, G - 1)
        tgt = gb[safe]
        shape_l = bounded_iou_loss(anc, tgt).sum(-1)
        return jnp.where(pos_m, shape_l, 0.0).sum()

    rngs = jax.random.split(rng, 2 * B)
    shape_sums = jax.vmap(per_image_shape)(
        rngs[:B], anchors, gt_bboxes, gt_labels, gt_valid)
    # anchor_total_num: fg+bg, and RandomSampler fills to 256/img
    loss_shape = (cfg.loss_shape_weight * shape_sums.sum()
                  / float(cfg.sample_num * B))

    # --- head losses on the predicted (detached) anchors ---
    anchors_d = jax.lax.stop_gradient(anchors)
    assign = jax.vmap(lambda a, gb, gl, gv: max_iou_assign(
        a, gb, gl, gv, C, pos_iou_thr=cfg.pos_iou,
        neg_iou_thr=cfg.neg_iou,
        min_pos_iou=cfg.min_pos_iou))(anchors_d, gt_bboxes, gt_labels,
                                      gt_valid)
    pos = assign.assigned_gt >= 0
    ignore = assign.assigned_gt == -2
    safe = jnp.clip(assign.assigned_gt, 0, G - 1)
    tgt = jnp.take_along_axis(gt_bboxes, safe[..., None], axis=1)

    onehot = jax.nn.one_hot(assign.labels, C + 1)[..., :C]
    if cfg.focal_cls:
        num_total = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
        w_cls = jnp.where(ignore, 0.0, 1.0)[..., None]
        loss_cls = cfg.loss_cls_weight * L.sigmoid_focal_loss(
            cls_flat.reshape(-1, C), onehot.reshape(-1, C),
            weight=w_cls.reshape(-1, 1),
            avg_factor=num_total, gamma=cfg.focal_gamma,
            alpha=cfg.focal_alpha)
        w_pos = pos
    else:
        # rpn protocol: sampled sigmoid CE, avg = sampled total
        pos_m, neg_m = jax.vmap(
            lambda r, a: _sampled_masks(r, a, cfg.sample_num,
                                        cfg.pos_fraction))(
            rngs[B:], assign.assigned_gt)
        num_total = jnp.asarray(float(cfg.sample_num * B))
        w_cls = (pos_m | neg_m).astype(jnp.float32)[..., None]
        loss_cls = cfg.loss_cls_weight * L.bce_loss(
            cls_flat.reshape(-1), onehot.reshape(-1),
            weight=jnp.broadcast_to(w_cls, cls_flat.shape).reshape(-1),
            avg_factor=num_total)
        w_pos = pos_m
    deltas_t = jax.vmap(lambda a, t: bbox2delta(a, t, stds=cfg.bbox_stds)
                        )(anchors_d, tgt)
    wreg = jnp.repeat(w_pos.astype(jnp.float32)[..., None], 4,
                      -1).reshape(-1, 4)
    loss_bbox = cfg.loss_bbox_weight * L.smooth_l1_loss(
        reg_flat.reshape(-1, 4), deltas_t.reshape(-1, 4), weight=wreg,
        avg_factor=num_total, beta=cfg.smooth_beta)
    return dict(loss_loc=loss_loc, loss_shape=loss_shape,
                loss_cls=loss_cls, loss_bbox=loss_bbox)


def ga_get_bboxes(out: GAHeadOutputs, centers, strides, img_hw,
                  scale_factor=None, score_thr: float = 0.05,
                  loc_thr: float = 0.01, nms_iou: float = 0.5,
                  nms_pre: int = 1000, max_per_img: int = 100,
                  rescale: bool = False,
                  sigma: float = float(OCTAVE_SCALE),
                  shape_std: float = 1.0,
                  bbox_stds=(1.0, 1.0, 1.0, 1.0)):
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
    anchors = guided_anchors(centers, strides, shape_flat, sigma=sigma,
                             shape_std=shape_std)

    level_sizes = [c.shape[1] * c.shape[2] for c in out.cls_scores]

    def per_image(cls_s, delta, loc, anc, hw, sf):
        # anchor-free masking by the location score
        keep = jax.nn.sigmoid(loc) >= loc_thr
        probs = jax.nn.sigmoid(cls_s) * keep[:, None]
        # nms_pre applies PER LEVEL (the reference's
        # _get_bboxes_single loops levels)
        top = filter_scores_and_topk_mlvl(probs, score_thr,
                                          nms_pre, level_sizes)
        boxes = delta2bbox(anc[top.keep_idxs], delta[top.keep_idxs],
                           stds=bbox_stds)
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


# --- family registrations (dskd_tpu/registry.py) ------------------------

def _register():
    from ..registry import register_family

    # ---- ga_rpn (class-agnostic guided-anchor proposal network) ----
    def build_rpn(cfg):
        return GARPN(depth=cfg.model.depth,
                     frozen_stages=cfg.model.frozen_stages)

    def losses_rpn(model, cfg, **_):
        det_cfg = GALossConfig(
            num_classes=1, focal_cls=False, smooth_beta=1.0,
            strides=GARPN_STRIDES, octave_scale=GARPN_OCTAVE_SCALE,
            anchor_sigma=float(GARPN_OCTAVE_SCALE), shape_std=0.14,
            bbox_stds=(0.07, 0.07, 0.11, 0.11),
            ga_pos=0.7, ga_neg=0.3, ga_min_pos=0.3,
            pos_iou=0.7, neg_iou=0.3, min_pos_iou=0.3)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            centers, strides, approxs, counts = ga_geometry(
                [c.shape[1:3] for c in out.head.cls_scores],
                level_strides=GARPN_STRIDES,
                octave_scale=GARPN_OCTAVE_SCALE)
            return ga_loss(out.head, centers, strides, approxs, counts,
                           batch.gt_bboxes,
                           jnp.zeros_like(batch.gt_labels),
                           batch.gt_valid, det_cfg, rng), None
        return losses_fn

    def eval_rpn(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            centers, strides, _, _ = ga_geometry(
                [c.shape[1:3] for c in out.head.cls_scores],
                level_strides=GARPN_STRIDES,
                octave_scale=GARPN_OCTAVE_SCALE)
            d = ga_get_bboxes(out.head, centers, strides, img_hw,
                              scale_factor=scale_factors, score_thr=0.0,
                              nms_iou=0.7, max_per_img=max_per_img,
                              rescale=True,
                              sigma=float(GARPN_OCTAVE_SCALE),
                              shape_std=0.14,
                              bbox_stds=(0.07, 0.07, 0.11, 0.11))
            return Det(d["bboxes"], d["scores"],
                       jnp.zeros(d["scores"].shape, jnp.int32), d["valid"])
        return step

    register_family("ga_rpn", build=build_rpn, losses=losses_rpn,
                    eval_step=eval_rpn)

    # ---- ga_retina ----
    def build_retina(cfg):
        m = cfg.model
        return GARetinaNet(num_classes=m.num_classes, depth=m.depth,
                           frozen_stages=m.frozen_stages)

    def losses_retina(model, cfg, **_):
        det_cfg = GALossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            centers, strides, approxs, counts = ga_geometry(
                [c.shape[1:3] for c in out.head.cls_scores])
            return ga_loss(out.head, centers, strides, approxs, counts,
                           batch.gt_bboxes, batch.gt_labels,
                           batch.gt_valid, det_cfg, rng), None
        return losses_fn

    def eval_retina(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            centers, strides, _, _ = ga_geometry(
                [c.shape[1:3] for c in out.head.cls_scores])
            d = ga_get_bboxes(out.head, centers, strides, img_hw,
                              scale_factor=scale_factors,
                              score_thr=max(score_thr, 0.05),
                              max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("ga_retina", build=build_retina, losses=losses_retina,
                    eval_step=eval_retina)


_register()

"""RepPoints family (parity: mmdet dense_heads/reppoints_head.py +
configs/reppoints/reppoints_moment_r50_fpn_1x_coco.py, box AP 37.0).

Represent objects as 9 adaptive points:
  * init stage predicts per-cell point offsets; the MOMENT transform
    converts a point set to a pseudo box (mean +- std * exp(learnable
    moment, 0.01 gradient mix));
  * refine stage runs cls + point-residual branches through a DCN whose
    taps sit ON the init points (offsets = init points - regular grid,
    gradient_mul=0.1), residuals added to the DETACHED init points;
  * assignment: init = PointAssigner (each GT picks the nearest cell
    center on its log2-scale level); refine = MaxIoU on decoded init
    boxes; losses: focal cls + SmoothL1(beta 0.11) on stride-normalized
    box coords (init weight 0.5, refine 1.0).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core import losses as L
from ..core.boxes import bbox_overlaps
from ..core.postprocess import batched_nms, filter_scores_and_topk, \
    filter_scores_and_topk_mlvl
from ..ops.deform_conv import deform_conv2d
from .fpn import FPN
from .gfl_detr_head import bias_init_with_prob
from .resnet import ResNet

STRIDES = (8, 16, 32, 64, 128)
NUM_POINTS = 9
BASE_SCALE = 4
GRADIENT_MUL = 0.1
MOMENT_MUL = 0.01


class RepPointsHeadOutputs(NamedTuple):
    cls_scores: Tuple[jnp.ndarray, ...]   # (B, H, W, C)
    pts_init: Tuple[jnp.ndarray, ...]     # (B, H, W, 18) (dy, dx) pairs
    pts_refine: Tuple[jnp.ndarray, ...]   # (B, H, W, 18)


class RepPointsOutputs(NamedTuple):
    head: RepPointsHeadOutputs
    neck_feats: Tuple[jnp.ndarray, ...]
    moment: jnp.ndarray                   # (2,) shared moment transfer


class RepPointsHead(nn.Module):
    num_classes: int = 80
    stacked_convs: int = 3
    feat_channels: int = 256
    point_feat_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]
                 ) -> RepPointsHeadOutputs:
        C = self.feat_channels
        P2 = NUM_POINTS * 2
        # init parity (reppoints_head.py:58-66): EVERY conv Normal(0.01)
        # including the point-offset predictors (the reference does NOT
        # zero-init them); cls_out bias at prior prob 0.01
        n01 = nn.initializers.normal(0.01)
        convs = {}
        for i in range(self.stacked_convs):
            for p in ("cls", "pts"):
                convs[f"{p}{i}"] = nn.Conv(
                    C, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=n01, name=f"{p}_conv{i}")
        init_conv = nn.Conv(self.point_feat_channels, (3, 3),
                            padding=[(1, 1), (1, 1)], kernel_init=n01,
                            name="reppoints_pts_init_conv")
        init_out = nn.Conv(P2, (1, 1), kernel_init=n01,
                           bias_init=nn.initializers.zeros,
                           name="reppoints_pts_init_out")
        cls_w = self.param("reppoints_cls_conv_kernel",
                           nn.initializers.normal(0.01), (3, 3, C, C))
        cls_out = nn.Conv(
            self.num_classes, (1, 1), kernel_init=n01,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="reppoints_cls_out")
        refine_w = self.param("reppoints_pts_refine_conv_kernel",
                              nn.initializers.normal(0.01), (3, 3, C, C))
        refine_out = nn.Conv(P2, (1, 1), kernel_init=n01,
                             bias_init=nn.initializers.zeros,
                             name="reppoints_pts_refine_out")

        # regular 3x3 grid (dy, dx) the DCN offsets are relative to
        base = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1],
                                    indexing="ij"), -1).reshape(-1, 2)
        base = jnp.asarray(base, jnp.float32).reshape(-1)   # (18,)

        cls_scores, pts_inits, pts_refines = [], [], []
        for f in feats:
            c = p = f
            for i in range(self.stacked_convs):
                c = nn.relu(convs[f"cls{i}"](c))
                p = nn.relu(convs[f"pts{i}"](p))
            pi = init_out(nn.relu(init_conv(p)))            # (B,H,W,18)
            grad_mix = (GRADIENT_MUL * pi
                        + (1 - GRADIENT_MUL) * jax.lax.stop_gradient(pi))
            dcn_off = grad_mix - base[None, None, None, :]
            cs = cls_out(nn.relu(deform_conv2d(c, dcn_off, cls_w)))
            pr = refine_out(nn.relu(deform_conv2d(p, dcn_off, refine_w)))
            pr = pr + jax.lax.stop_gradient(pi)
            cls_scores.append(cs)
            pts_inits.append(pi)
            pts_refines.append(pr)
        return RepPointsHeadOutputs(tuple(cls_scores), tuple(pts_inits),
                                    tuple(pts_refines))


class RepPoints(nn.Module):
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
        head = RepPointsHead(num_classes=self.num_classes,
                             name="bbox_head")(neck)
        # the moment transfer is a learnable (2,) param shared by every
        # level's points2bbox
        moment = self.param("moment_transfer", nn.initializers.zeros, (2,))
        return RepPointsOutputs(head, neck, moment)


def points2bbox(pts: jnp.ndarray, moment: jnp.ndarray) -> jnp.ndarray:
    """(N, 18) (dy, dx) point offsets (any coordinate frame) -> (N, 4)
    moment-transform pseudo boxes in the same frame."""
    p = pts.reshape(pts.shape[:-1] + (NUM_POINTS, 2))
    py, px = p[..., 0], p[..., 1]
    my, mx = py.mean(-1), px.mean(-1)
    # torch.std is unbiased (/(n-1)); jnp defaults to /n
    sy = py.std(-1, ddof=1)
    sx = px.std(-1, ddof=1)
    m = (moment * MOMENT_MUL
         + jax.lax.stop_gradient(moment) * (1 - MOMENT_MUL))
    hw = sx * jnp.exp(m[0])
    hh = sy * jnp.exp(m[1])
    return jnp.stack([mx - hw, my - hh, mx + hw, my + hh], -1)


def reppoints_centers(featmap_sizes):
    """All-level grid points (N, 2) image coords + per-point stride (N,)
    + per-level counts.

    RepPoints deliberately uses OFFSET-0 priors — reppoints_head.py:98
    ``MlvlPointGenerator(self.point_strides, offset=0.)`` — so centers
    sit at x*stride, not the (x+0.5)*stride cell centers FCOS uses."""
    pts, strides, counts = [], [], []
    for (h, w), s in zip(featmap_sizes, STRIDES):
        ys, xs = np.mgrid[:h, :w]
        pts.append(np.stack([xs * s, ys * s],
                            -1).reshape(-1, 2))
        strides.append(np.full((h * w,), s, np.float32))
        counts.append(h * w)
    return (jnp.asarray(np.concatenate(pts), jnp.float32),
            jnp.asarray(np.concatenate(strides)), tuple(counts))


def point_assign(centers, strides, level_counts, gt_bboxes, gt_labels,
                 gt_valid, num_classes: int, scale: int = BASE_SCALE):
    """PointAssigner (point_assigner.py:24-121, reppoints config
    pos_num=1): each GT lands on the level matching
    floor(log2(sqrt(wh)/scale)) and claims the cell center there nearest
    under the per-axis (w, h)-NORMALIZED metric
    ||(p - c) / (gw, gh)|| (point_assigner.py:101); when two GTs claim
    the same point, the one at smaller normalized distance wins, earlier
    gt index breaking exact ties (the reference's strict `<` against the
    recorded dist, point_assigner.py:111-121)."""
    N = centers.shape[0]
    G = gt_bboxes.shape[0]
    gw = jnp.clip(gt_bboxes[:, 2] - gt_bboxes[:, 0], 1e-6)
    gh = jnp.clip(gt_bboxes[:, 3] - gt_bboxes[:, 1], 1e-6)
    # gt level: floor(log2(sqrt(area)/scale)) in log2-stride units; level
    # index i has log2(stride) = 3 + i (strides 8..128)
    lvl = jnp.clip(
        jnp.floor(jnp.log2(jnp.sqrt(gw * gh) / scale)).astype(jnp.int32)
        - 3, 0, len(level_counts) - 1)
    # per-point level id
    pl = jnp.concatenate([jnp.full((n,), i, jnp.int32)
                          for i, n in enumerate(level_counts)])
    gcx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2
    gcy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2
    d = jnp.sqrt(((centers[:, 0][None] - gcx[:, None]) / gw[:, None]) ** 2
                 + ((centers[:, 1][None] - gcy[:, None])
                    / gh[:, None]) ** 2)                        # (G, N)
    d = jnp.where((pl[None] == lvl[:, None]) & gt_valid[:, None],
                  d, jnp.inf)
    nearest = jnp.argmin(d, axis=1)                             # (G,)
    dmin = d.min(1)
    ok = jnp.isfinite(dmin) & gt_valid
    # closest-gt-wins: rank GTs by (dist asc, index asc), scatter-min the
    # rank per point, then map the winning rank back to its gt index.
    order = jnp.lexsort((jnp.arange(G), dmin))                  # rank -> gt
    rank = jnp.zeros((G,), jnp.int32).at[order].set(
        jnp.arange(G, dtype=jnp.int32))                         # gt -> rank
    best_rank = jnp.full((N,), G, jnp.int32).at[
        jnp.where(ok, nearest, N)].min(rank, mode="drop")
    assigned = jnp.where(best_rank < G,
                         order[jnp.clip(best_rank, 0, G - 1)], -1)
    pos = assigned >= 0
    safe = jnp.clip(assigned, 0, G - 1)
    labels = jnp.where(pos, gt_labels[safe], num_classes)
    return assigned, pos, labels


class RepPointsLossConfig(NamedTuple):
    num_classes: int = 80
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    loss_init_weight: float = 0.5
    loss_refine_weight: float = 1.0
    smooth_beta: float = 0.11
    refine_pos_iou: float = 0.5
    refine_neg_iou: float = 0.4


def _decoded_boxes(pts_flat, centers, strides, moment):
    """Point offsets (stride units) -> image-coord pseudo boxes."""
    scaled = pts_flat * strides[None, :, None]
    boxes = points2bbox(scaled, moment)                   # center-relative
    return boxes + jnp.concatenate([centers, centers], -1)[None]


def reppoints_loss(out: RepPointsHeadOutputs, moment, gt_bboxes, gt_labels,
                   gt_valid, cfg: RepPointsLossConfig
                   ) -> Dict[str, jnp.ndarray]:
    B = out.cls_scores[0].shape[0]
    C = cfg.num_classes
    centers, strides, counts = reppoints_centers(
        [c.shape[1:3] for c in out.cls_scores])
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], 1)
    pi_flat = jnp.concatenate(
        [p.reshape(B, -1, 2 * NUM_POINTS) for p in out.pts_init], 1)
    pr_flat = jnp.concatenate(
        [p.reshape(B, -1, 2 * NUM_POINTS) for p in out.pts_refine], 1)

    init_boxes = _decoded_boxes(pi_flat, centers, strides, moment)
    refine_boxes = _decoded_boxes(pr_flat, centers, strides, moment)
    G = gt_bboxes.shape[1]

    # init stage: point assigner
    a_init, pos_i, _ = jax.vmap(
        lambda b, l, v: point_assign(centers, strides, counts, b, l, v,
                                     C))(gt_bboxes, gt_labels, gt_valid)
    # refine stage: full MaxIoUAssigner semantics on the detached init
    # boxes (reppoints config: pos 0.5 / neg 0.4 / min_pos_iou 0 with
    # low-quality gt-best matching; the [0.4, 0.5) band is IGNORED in the
    # cls loss, not negative)
    from ..core.max_iou_assigner import max_iou_assign

    def refine_assign(boxes, gb, gl, gv):
        res = max_iou_assign(
            jax.lax.stop_gradient(boxes), gb, gl, gv, C,
            pos_iou_thr=cfg.refine_pos_iou,
            neg_iou_thr=cfg.refine_neg_iou, min_pos_iou=0.0,
            match_low_quality=True)
        return res.assigned_gt, res.assigned_gt >= 0, res.assigned_gt == -2

    a_ref, pos_r, ign_r = jax.vmap(refine_assign)(
        init_boxes, gt_bboxes, gt_labels, gt_valid)

    norm = (BASE_SCALE * strides)[None, :, None]          # (1, N, 1)

    def box_loss(boxes, assigned, pos, weight):
        npos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
        safe = jnp.clip(assigned, 0, G - 1)
        tgt = jnp.take_along_axis(gt_bboxes, safe[..., None], axis=1)
        w = jnp.repeat(pos.astype(jnp.float32)[..., None], 4,
                       -1).reshape(-1, 4)
        # reppoints_head.py loss_single: the (N, 4)-weighted SmoothL1 sum
        # is divided by num_total_samples (= npos), NOT 4*npos
        return weight * L.smooth_l1_loss(
            (boxes / norm).reshape(-1, 4), (tgt / norm).reshape(-1, 4),
            weight=w, avg_factor=npos, beta=cfg.smooth_beta)

    loss_init = box_loss(init_boxes, a_init, pos_i, cfg.loss_init_weight)
    loss_refine = box_loss(refine_boxes, a_ref, pos_r,
                           cfg.loss_refine_weight)

    labels = jnp.where(pos_r,
                       jnp.take_along_axis(
                           gt_labels, jnp.clip(a_ref, 0, G - 1),
                           axis=1).astype(jnp.int32), C)
    num_pos = jnp.maximum(pos_r.sum().astype(jnp.float32), 1.0)
    onehot = jax.nn.one_hot(labels, C + 1)[..., :C]
    # anchors in the [neg, pos) IoU band are ignored (label_weights=0)
    lw = jnp.repeat((~ign_r).astype(jnp.float32)[..., None], C,
                    -1).reshape(-1, C)
    loss_cls = cfg.loss_cls_weight * L.sigmoid_focal_loss(
        cls_flat.reshape(-1, C), onehot.reshape(-1, C), weight=lw,
        avg_factor=num_pos, gamma=cfg.focal_gamma, alpha=cfg.focal_alpha)
    return dict(loss_cls=loss_cls, loss_pts_init=loss_init,
                loss_pts_refine=loss_refine)


def reppoints_get_bboxes(out: RepPointsHeadOutputs, moment, img_hw,
                         scale_factor=None, score_thr: float = 0.05,
                         nms_iou: float = 0.5, nms_pre: int = 1000,
                         max_per_img: int = 100, rescale: bool = False):
    B = out.cls_scores[0].shape[0]
    C = out.cls_scores[0].shape[-1]
    centers, strides, _ = reppoints_centers(
        [c.shape[1:3] for c in out.cls_scores])
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], 1)
    pr_flat = jnp.concatenate(
        [p.reshape(B, -1, 2 * NUM_POINTS) for p in out.pts_refine], 1)
    boxes_flat = _decoded_boxes(pr_flat, centers, strides, moment)

    level_sizes = [c.shape[1] * c.shape[2] for c in out.cls_scores]

    def per_image(cls_s, bx, hw, sf):
        probs = jax.nn.sigmoid(cls_s)
        # nms_pre applies PER LEVEL (the reference's
        # _get_bboxes_single loops levels)
        top = filter_scores_and_topk_mlvl(probs, score_thr,
                                          nms_pre, level_sizes)
        bsel = bx[top.keep_idxs]
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
    nb, ns, nl, keep = jax.vmap(per_image)(cls_flat, boxes_flat, img_hw,
                                           scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=keep)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return RepPoints(num_classes=m.num_classes, depth=m.depth,
                         frozen_stages=m.frozen_stages)

    def losses(model, cfg, **_):
        det_cfg = RepPointsLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            return reppoints_loss(out.head, out.moment, batch.gt_bboxes,
                                  batch.gt_labels, batch.gt_valid,
                                  det_cfg), None
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            d = reppoints_get_bboxes(out.head, out.moment, img_hw,
                                     scale_factor=scale_factors,
                                     score_thr=max(score_thr, 0.05),
                                     max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("reppoints", build=build, losses=losses,
                    eval_step=eval_step)


_register()

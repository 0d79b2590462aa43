"""Grid R-CNN (parity: mmdet detectors/grid_rcnn.py +
roi_heads/mask_heads/grid_head.py + configs/grid_rcnn, box AP 40.4).

The second stage localizes by PREDICTING 9 GRID POINTS as heatmaps
instead of regressing deltas:
  * grid head: 14x14 RoIAligned features -> 8 convs (first stride 2,
    GN(36)) to 9 x 64 point-grouped channels -> first- and second-order
    FUSION (each point's features receive 5x5-depthwise + 1x1 transitions
    from its 4-neighbors; second order repeats over the fused maps) ->
    two grouped x2 deconvs to a 28x28 heatmap per point;
  * targets: ROIs are the positive samples EXTENDED 2x around their
    center; each GT grid point rasterizes a pos_radius=1 disk on its
    heatmap; BCE-with-logits, weight 15, fused + unfused supervised;
  * Grid R-CNN Plus sub-regions: the 28x28 output channel of each point
    is its own sub-window of a virtual 56x56 whole map over the 2x
    extended ROI (calc_sub_regions); targets rasterize on the whole map
    and crop, decode adds the sub-window origin back;
  * decode: per-point spatial argmax (+0.5 cell center) mapped back from
    the extended ROI; each box side is the prob-weighted mean of its 3
    border points.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core import losses as L

GRID_POINTS = 9
GRID_SIZE = 3
POINT_CH = 64
HEATMAP = 28
POS_RADIUS = 1


def _neighbors():
    out = []
    for i in range(GRID_SIZE):
        for j in range(GRID_SIZE):
            n = []
            if i > 0:
                n.append((i - 1) * GRID_SIZE + j)
            if j > 0:
                n.append(i * GRID_SIZE + j - 1)
            if j < GRID_SIZE - 1:
                n.append(i * GRID_SIZE + j + 1)
            if i < GRID_SIZE - 1:
                n.append((i + 1) * GRID_SIZE + j)
            out.append(tuple(n))
    return out


NEIGHBORS = _neighbors()


class _GroupedDeconv(nn.Module):
    """k=4 s=2 p=1 transposed conv with feature groups, built on
    conv_general_dilated (lhs_dilation=2) since flax's ConvTranspose has
    no grouping."""
    features: int
    groups: int

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (4, 4, x.shape[-1] // self.groups, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding=[(2, 2), (2, 2)],
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups)
        return y + b


class _Trans(nn.Module):
    """5x5 depthwise + 1x1 point transition."""
    @nn.compact
    def __call__(self, x):
        y = nn.Conv(POINT_CH, (5, 5), padding=[(2, 2), (2, 2)],
                    feature_group_count=POINT_CH, name="dw")(x)
        return nn.Conv(POINT_CH, (1, 1), name="pw")(y)


class GridHead(nn.Module):
    num_convs: int = 8

    @nn.compact
    def __call__(self, roi_feats):
        """roi_feats: (M, 14, 14, C) -> dict(fused, unfused) heatmap
        logits, each (M, 28, 28, 9)."""
        C = GRID_POINTS * POINT_CH
        x = roi_feats
        for i in range(self.num_convs):
            x = nn.Conv(C, (3, 3), strides=(2, 2) if i == 0 else (1, 1),
                        padding=[(1, 1), (1, 1)], name=f"conv{i}")(x)
            x = nn.relu(nn.GroupNorm(epsilon=1e-5, num_groups=36,
                                     name=f"gn{i}")(x))
        pts = [x[..., i * POINT_CH:(i + 1) * POINT_CH]
               for i in range(GRID_POINTS)]

        fo = []
        for i, nbrs in enumerate(NEIGHBORS):
            acc = pts[i]
            for j, p in enumerate(nbrs):
                acc = acc + _Trans(name=f"fo_{i}_{j}")(pts[p])
            fo.append(acc)
        so = []
        for i, nbrs in enumerate(NEIGHBORS):
            acc = pts[i]
            for j, p in enumerate(nbrs):
                acc = acc + _Trans(name=f"so_{i}_{j}")(fo[p])
            so.append(acc)

        def up_head(y, tag):
            y = _GroupedDeconv(C, GRID_POINTS,
                               name=f"{tag}_deconv1")(y)
            y = nn.relu(nn.GroupNorm(epsilon=1e-5,
                                     num_groups=GRID_POINTS,
                                     name=f"{tag}_gn")(y))
            return _GroupedDeconv(GRID_POINTS, GRID_POINTS,
                                  name=f"{tag}_deconv2")(y)

        return dict(fused=up_head(jnp.concatenate(so, -1), "fused"),
                    unfused=up_head(x, "unfused"))


def extend_rois(rois, factor: float = 2.0):
    cx = (rois[..., 0] + rois[..., 2]) / 2
    cy = (rois[..., 1] + rois[..., 3]) / 2
    hw = (rois[..., 2] - rois[..., 0]) * factor / 2
    hh = (rois[..., 3] - rois[..., 1]) * factor / 2
    return jnp.stack([cx - hw, cy - hh, cx + hw, cy + hh], -1)


WHOLE_MAP = HEATMAP * 2        # virtual 56x56 map over the extended roi


def _sub_regions():
    """Per-point 28x28 sub-window origins in the 56 whole map
    (grid_head.py:193-222, Grid R-CNN Plus)."""
    half = WHOLE_MAP // 4 * 2
    origins = []
    for i in range(GRID_POINTS):
        x_idx, y_idx = i // GRID_SIZE, i % GRID_SIZE
        def o(idx):
            if idx == 0:
                return 0
            if idx == GRID_SIZE - 1:
                return half
            return max(int((idx / (GRID_SIZE - 1) - 0.25) * WHOLE_MAP), 0)
        origins.append((o(x_idx), o(y_idx)))
    return origins


SUB_ORIGINS = _sub_regions()


def grid_targets(ext_rois, gt_boxes):
    """(R, 4) extended ROIs + matched GT -> (R, 28, 28, 9) binary maps.

    Faithful to grid_head.py get_targets: each grid point's disk
    (pos_radius=1, integer cells) is rasterized on the virtual
    56x56 whole map, and channel j is its own 28x28 SUB-REGION crop
    (2x finer than a naive 28 whole map). Expanded rois narrower than
    grid_size pixels get all-zero targets (the 'ignore small bboxes'
    skip)."""
    ew = jnp.clip(ext_rois[:, 2] - ext_rois[:, 0], 1e-4)
    eh = jnp.clip(ext_rois[:, 3] - ext_rois[:, 1], 1e-4)
    frac = jnp.asarray(np.array(
        [[i / (GRID_SIZE - 1), j / (GRID_SIZE - 1)]
         for i in range(GRID_SIZE) for j in range(GRID_SIZE)],
        np.float32))                                  # (9, 2) (fx, fy)
    # grid point p = (x1 + fx*(x2-x1), y1 + fy*(y2-y1)) with the
    # NEIGHBORS indexing (i = column, j = row)
    gx = gt_boxes[:, 0:1] + frac[None, :, 0] * (
        gt_boxes[:, 2:3] - gt_boxes[:, 0:1])          # (R, 9)
    gy = gt_boxes[:, 1:2] + frac[None, :, 1] * (
        gt_boxes[:, 3:4] - gt_boxes[:, 1:2])
    # int() truncation to whole-map integer cells (reference :272-275)
    cx = jnp.trunc((gx - ext_rois[:, 0:1]) / ew[:, None] * WHOLE_MAP)
    cy = jnp.trunc((gy - ext_rois[:, 1:2]) / eh[:, None] * WHOLE_MAP)
    ox = jnp.asarray([o[0] for o in SUB_ORIGINS], jnp.float32)
    oy = jnp.asarray([o[1] for o in SUB_ORIGINS], jnp.float32)
    cells = jnp.arange(HEATMAP, dtype=jnp.float32)
    # whole-map coords of each sub-window cell, per point
    X = cells[None, :] + ox[:, None]                  # (9, 28)
    Y = cells[None, :] + oy[:, None]
    dx = X[None, :, :] - cx[:, :, None]               # (R, 9, 28)
    dy = Y[None, :, :] - cy[:, :, None]
    disk = (dy[:, :, :, None] ** 2 + dx[:, :, None, :] ** 2
            <= POS_RADIUS ** 2)                       # (R, 9, 28y, 28x)
    small = (ew <= GRID_SIZE) | (eh <= GRID_SIZE)
    disk = disk & ~small[:, None, None, None]
    return disk.transpose(0, 2, 3, 1).astype(jnp.float32)


def grid_head_loss(grid_pred: Dict, ext_rois, gt_boxes, pos_valid,
                   weight: float = 15.0):
    tgt = grid_targets(ext_rois, gt_boxes)            # (R, 28, 28, 9)
    w = pos_valid.astype(jnp.float32)[:, None, None, None]
    navg = jnp.maximum(pos_valid.sum().astype(jnp.float32), 1.0) \
        * HEATMAP * HEATMAP * GRID_POINTS
    total = 0.0
    for key in ("fused", "unfused"):
        total = total + L.bce_loss(grid_pred[key].reshape(-1),
                                   tgt.reshape(-1),
                                   weight=jnp.broadcast_to(
                                       w, tgt.shape).reshape(-1),
                                   avg_factor=navg)
    return weight * total


def grid_decode(grid_pred_fused, ext_rois):
    """(R, 28, 28, 9) logits + extended ROIs -> (R, 4) boxes.

    Each point's channel is its sub-region: the argmax cell maps back to
    whole-map coords by adding the sub-window origin, then (X + 0.5)/56
    of the extended extent (grid_head.py:298-343)."""
    R = ext_rois.shape[0]
    probs = jax.nn.sigmoid(grid_pred_fused)
    flat = probs.transpose(0, 3, 1, 2).reshape(R, GRID_POINTS, -1)
    idx = jnp.argmax(flat, -1)
    score = flat.max(-1)                              # (R, 9)
    ox = jnp.asarray([o[0] for o in SUB_ORIGINS], jnp.float32)
    oy = jnp.asarray([o[1] for o in SUB_ORIGINS], jnp.float32)
    py = (idx // HEATMAP).astype(jnp.float32) + oy[None] + 0.5
    px = (idx % HEATMAP).astype(jnp.float32) + ox[None] + 0.5
    ew = ext_rois[:, 2:3] - ext_rois[:, 0:1]
    eh = ext_rois[:, 3:4] - ext_rois[:, 1:2]
    ax = ext_rois[:, 0:1] + px / WHOLE_MAP * ew       # absolute coords
    ay = ext_rois[:, 1:2] + py / WHOLE_MAP * eh

    def side(pt_ids, coords):
        ids = jnp.asarray(pt_ids)
        s = score[:, ids]
        return (coords[:, ids] * s).sum(-1) / jnp.clip(s.sum(-1), 1e-6)

    # NEIGHBORS indexing: point i*3+j with i = column, j = row
    x1 = side((0, 1, 2), ax)
    x2 = side((6, 7, 8), ax)
    y1 = side((0, 3, 6), ay)
    y2 = side((2, 5, 8), ay)
    return jnp.stack([x1, y1, x2, y2], -1)


class GridRCNNOutputs(NamedTuple):
    rpn: object
    neck_feats: Tuple[jnp.ndarray, ...]


class GridRCNN(nn.Module):
    """Two-stage detector: classification-only ROI head + grid head
    (detectors/grid_rcnn.py — the delta regression branch is removed,
    localization comes entirely from the grid points)."""
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = 1

    def setup(self):
        from .faster_rcnn import BBoxHead, RPNHead
        from .fpn import FPN
        from .resnet import ResNet
        self.backbone = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                               frozen_stages=self.frozen_stages)
        self.neck = FPN(out_channels=256, num_outs=5, start_level=0,
                        add_extra_convs="")
        self.rpn_head = RPNHead()
        self.roi_bbox_head = BBoxHead(num_classes=self.num_classes)
        self.grid_head = GridHead()

    def __call__(self, images, img_hw, deterministic: bool = True):
        feats = self.backbone(images)
        neck = self.neck(feats)
        return GridRCNNOutputs(self.rpn_head(neck), neck)

    def roi_forward(self, roi_feats):
        return self.roi_bbox_head(roi_feats)

    def grid_forward(self, roi_feats14):
        return self.grid_head(roi_feats14)

    def init_all(self, images, img_hw):
        out = self(images, img_hw)
        self.roi_bbox_head(jnp.zeros((1, 7, 7, 256), images.dtype))
        self.grid_head(jnp.zeros((1, 14, 14, 256), images.dtype))
        return out


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return GridRCNN(num_classes=m.num_classes, depth=m.depth,
                        frozen_stages=m.frozen_stages)

    def losses(model, cfg, **_):
        from ..core.max_iou_assigner import max_iou_assign, random_sample
        from ..models.faster_rcnn import (RPNLossConfig, rpn_loss,
                                          rpn_proposals)
        from ..ops.roi_align import multi_level_roi_align
        rpn_cfg = RPNLossConfig()
        NCgr = cfg.model.num_classes

        def losses_fn(variables, batch, teacher_vars, rng):
            from ..core import losses as CL
            rng1, rng2 = jax.random.split(rng)
            out = model.apply(variables, batch.images, batch.img_hw)
            losses = rpn_loss(out.rpn, batch.gt_bboxes, batch.gt_valid,
                              batch.img_hw, rng1, rpn_cfg)
            props, _, pvalid = rpn_proposals(
                out.rpn, batch.img_hw, nms_pre=1000,
                max_total=cfg.rcnn_num_proposals)
            props = jax.lax.stop_gradient(props)
            B = props.shape[0]
            G = batch.gt_bboxes.shape[1]
            S = cfg.rcnn_num_samples

            def per_image(r, rois, rv, gtb, gtl, gtv, feats):
                rois_all = jnp.concatenate([rois, gtb], 0)
                rv_all = jnp.concatenate([rv, gtv], 0)
                assign = max_iou_assign(rois_all, gtb, gtl, gtv, NCgr,
                                        0.5, 0.5, 0.5,
                                        match_low_quality=False)
                a = jnp.where(rv_all, assign.assigned_gt, -2)
                sample = random_sample(r, a, S, 0.25)
                idx = jnp.concatenate([sample.pos_idx, sample.neg_idx])
                is_pos = jnp.concatenate(
                    [sample.pos_valid, jnp.zeros_like(sample.neg_valid)])
                valid = jnp.concatenate([sample.pos_valid,
                                         sample.neg_valid])
                srois = rois_all[idx]
                safe = jnp.clip(a[idx], 0, G - 1)
                labels = jnp.where(is_pos, gtl[safe].astype(jnp.int32),
                                   NCgr)
                f7 = multi_level_roi_align(feats, srois, valid)
                # grid stage: POSITIVES only, extended 2x
                prois = rois_all[sample.pos_idx]
                erois = extend_rois(prois)
                f14 = multi_level_roi_align(feats, erois,
                                            sample.pos_valid,
                                            out_size=14)
                ptgt = gtb[jnp.clip(a[sample.pos_idx], 0, G - 1)]
                return (f7, labels, valid, f14, erois, ptgt,
                        sample.pos_valid)

            feats_pi = [tuple(f[b] for f in out.neck_feats[:4])
                        for b in range(B)]
            parts = [per_image(jax.random.fold_in(rng2, b), props[b],
                               pvalid[b], batch.gt_bboxes[b],
                               batch.gt_labels[b], batch.gt_valid[b],
                               feats_pi[b]) for b in range(B)]
            f7 = jnp.concatenate([p[0] for p in parts])
            labels = jnp.concatenate([p[1] for p in parts])
            valid = jnp.concatenate([p[2] for p in parts])
            cls_logits, _ = model.apply(variables, f7,
                                        method=GridRCNN.roi_forward)
            nt = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
            losses["rcnn_loss_cls"] = CL.cross_entropy_loss(
                cls_logits, labels, weight=valid.astype(jnp.float32),
                avg_factor=nt)
            f14 = jnp.concatenate([p[3] for p in parts])
            erois = jnp.concatenate([p[4] for p in parts])
            ptgt = jnp.concatenate([p[5] for p in parts])
            pvalid_all = jnp.concatenate([p[6] for p in parts])
            grid_pred = model.apply(variables, f14,
                                    method=GridRCNN.grid_forward)
            losses["loss_grid"] = grid_head_loss(grid_pred, erois, ptgt,
                                                 pvalid_all)
            return losses, None
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..core.postprocess import batched_nms
        from ..models.faster_rcnn import rpn_proposals
        from ..ops.roi_align import multi_level_roi_align
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            props, _, pvalid = rpn_proposals(out.rpn, img_hw,
                                             nms_pre=1000, max_total=256)
            B = props.shape[0]

            def per_image(feats, rois, rv, hw, sf):
                f7 = multi_level_roi_align(feats, rois, rv)
                cls_logits, _ = model.apply(variables, f7,
                                            method=GridRCNN.roi_forward)
                p = jax.nn.softmax(cls_logits, -1)[:, :-1]
                p = jnp.where(rv[:, None], p, 0.0)
                scores = p.max(-1)
                labels = p.argmax(-1).astype(jnp.int32)
                k = min(max_per_img, rois.shape[0])
                top_s, keep = jax.lax.top_k(scores, k)
                rois_k = rois[keep]
                erois = extend_rois(rois_k)
                f14 = multi_level_roi_align(feats, erois, rv[keep],
                                            out_size=14)
                grid_pred = model.apply(variables, f14,
                                        method=GridRCNN.grid_forward)
                boxes = grid_decode(grid_pred["fused"], erois)
                h = hw[0].astype(boxes.dtype)
                w = hw[1].astype(boxes.dtype)
                boxes = jnp.stack([
                    jnp.clip(boxes[:, 0], 0, w),
                    jnp.clip(boxes[:, 1], 0, h),
                    jnp.clip(boxes[:, 2], 0, w),
                    jnp.clip(boxes[:, 3], 0, h)], -1)
                nb, ns, nl, kp, _ = batched_nms(
                    boxes, jnp.where(top_s > max(score_thr, 0.05),
                                     top_s, 0.0),
                    labels[keep], 0.5, max_per_img, valid=top_s > 0.0)
                return nb / sf[None], ns, nl, kp

            feats_pi = [tuple(f[b] for f in out.neck_feats[:4])
                        for b in range(B)]
            rs = [per_image(feats_pi[b], props[b], pvalid[b], img_hw[b],
                            scale_factors[b]) for b in range(B)]
            return Det(jnp.stack([r[0] for r in rs]),
                       jnp.stack([r[1] for r in rs]),
                       jnp.stack([r[2] for r in rs]),
                       jnp.stack([r[3] for r in rs]))
        return step

    register_family("grid_rcnn", build=build, losses=losses,
                    eval_step=eval_step, init_all=True)


_register()

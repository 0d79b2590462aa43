"""Box coders beyond the delta/distance/integral trio.

Parity targets:
  * TBLR coder — mmdet/core/bbox/coder/tblr_bbox_coder.py:77-206
    (bboxes2tblr / tblr2bboxes): offsets (top, bottom, left, right) from the
    prior center, optionally normalized by the prior's (h, h, w, w) and a
    scalar/4-vector normalizer. Used by FSAF-style heads.
  * YOLO coder — mmdet/core/bbox/coder/yolo_bbox_coder.py:31-83: grid-cell
    sigmoid-center + log-wh parameterization against anchor boxes.
  * Bucketing coder — mmdet/core/bbox/coder/bucketing_bbox_coder.py:95-351
    (SABL): each box side becomes a bucket classification over
    ceil(num_buckets/2) candidates plus a fine offset regression.

All functions are pure jnp ops over (..., 4) xyxy boxes — vmap/jit friendly,
no dynamic shapes.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np

Normalizer = Union[float, Sequence[float]]


def _norm_vec(normalizer: Normalizer):
    if isinstance(normalizer, (int, float)):
        return float(normalizer)
    v = jnp.asarray(normalizer, jnp.float32)
    assert v.shape == (4,), "normalizer must be scalar or length-4"
    return v


def bboxes2tblr(priors: jnp.ndarray, gts: jnp.ndarray,
                normalizer: Normalizer = 4.0,
                normalize_by_wh: bool = True) -> jnp.ndarray:
    """Encode GT boxes as (top, bottom, left, right) from prior centers.

    priors, gts: (..., 4) xyxy. Matches bboxes2tblr (tblr_bbox_coder.py:77):
    tb normalized by prior height, lr by prior width, then by ``normalizer``.
    """
    cx = (priors[..., 0] + priors[..., 2]) * 0.5
    cy = (priors[..., 1] + priors[..., 3]) * 0.5
    top = cy - gts[..., 1]
    bottom = gts[..., 3] - cy
    left = cx - gts[..., 0]
    right = gts[..., 2] - cx
    loc = jnp.stack([top, bottom, left, right], axis=-1)
    if normalize_by_wh:
        w = priors[..., 2] - priors[..., 0]
        h = priors[..., 3] - priors[..., 1]
        loc = loc / jnp.stack([h, h, w, w], axis=-1)
    return loc / _norm_vec(normalizer)


def tblr2bboxes(priors: jnp.ndarray, tblr: jnp.ndarray,
                normalizer: Normalizer = 4.0,
                normalize_by_wh: bool = True,
                max_hw: Optional[Sequence[int]] = None) -> jnp.ndarray:
    """Decode tblr offsets back to xyxy (tblr_bbox_coder.py:126-206).

    max_hw: optional (H, W) clip bound (the reference's max_shape w/
    clip_border=True).
    """
    loc = tblr * _norm_vec(normalizer)
    if normalize_by_wh:
        w = priors[..., 2] - priors[..., 0]
        h = priors[..., 3] - priors[..., 1]
        loc = loc * jnp.stack([h, h, w, w], axis=-1)
    cx = (priors[..., 0] + priors[..., 2]) * 0.5
    cy = (priors[..., 1] + priors[..., 3]) * 0.5
    boxes = jnp.stack([cx - loc[..., 2], cy - loc[..., 0],
                       cx + loc[..., 3], cy + loc[..., 1]], axis=-1)
    if max_hw is not None:
        hi = jnp.asarray([max_hw[1], max_hw[0], max_hw[1], max_hw[0]],
                         boxes.dtype)
        boxes = jnp.clip(boxes, 0.0, hi)
    return boxes


def bbox_rescale(boxes: jnp.ndarray, scale_factor: float) -> jnp.ndarray:
    """Scale boxes about their centers (bbox/transforms.py:213-242)."""
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    w = (boxes[..., 2] - boxes[..., 0]) * scale_factor
    h = (boxes[..., 3] - boxes[..., 1]) * scale_factor
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h,
                      cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def _bucket_grid(proposals, num_buckets, scale_factor):
    """(bucket_w, bucket_h, l/r/t/d bucket centers (n, side_num)) per
    bucketing_bbox_coder.py generat_buckets (:95-141)."""
    p = bbox_rescale(proposals, scale_factor)
    side = int(np.ceil(num_buckets / 2.0))
    pw = p[:, 2] - p[:, 0]
    ph = p[:, 3] - p[:, 1]
    bw = pw / num_buckets
    bh = ph / num_buckets
    steps = 0.5 + jnp.arange(side, dtype=p.dtype)
    l = p[:, 0, None] + steps[None] * bw[:, None]
    r = p[:, 2, None] - steps[None] * bw[:, None]
    t = p[:, 1, None] + steps[None] * bh[:, None]
    d = p[:, 3, None] - steps[None] * bh[:, None]
    return bw, bh, l, r, t, d


def bbox2bucket(proposals: jnp.ndarray, gt: jnp.ndarray, num_buckets: int,
                scale_factor: float, offset_topk: int = 2,
                offset_upperbound: float = 1.0,
                cls_ignore_neighbor: bool = True):
    """SABL side-aware bucketing targets (bucketing_bbox_coder.py:144-265).

    Returns (offsets (n, 4*side), offset_weights, bucket_labels one-hot
    (n, 4*side), cls_weights) — each side's nearest bucket is the label;
    the top-k nearest buckets carry fine-offset regression weight (k >= 1
    only when within offset_upperbound); cls weights ignore buckets within
    one bucket-width that are not the label when cls_ignore_neighbor.
    """
    import jax

    n = proposals.shape[0]
    side = int(np.ceil(num_buckets / 2.0))
    bw, bh, l, r, t, d = _bucket_grid(proposals, num_buckets, scale_factor)

    offs = [(l - gt[:, 0, None]) / bw[:, None],
            (r - gt[:, 2, None]) / bw[:, None],
            (t - gt[:, 1, None]) / bh[:, None],
            (d - gt[:, 3, None]) / bh[:, None]]

    w_parts, lbl_parts, clsw_parts = [], [], []
    for o in offs:
        topk_vals, topk_idx = jax.lax.top_k(-jnp.abs(o), offset_topk)
        topk_vals = -topk_vals
        w = jnp.zeros((n, side), o.dtype)
        for k in range(offset_topk):
            val = (1.0 if k == 0
                   else (topk_vals[:, k] < offset_upperbound).astype(
                       o.dtype))
            w = w.at[jnp.arange(n), topk_idx[:, k]].set(val)
        label = jax.nn.one_hot(topk_idx[:, 0], side, dtype=o.dtype)
        clsw = (jnp.abs(o) < 1).astype(o.dtype)
        if cls_ignore_neighbor:
            clsw = (~((clsw == 1) & (label == 0))).astype(o.dtype)
        else:
            clsw = jnp.ones_like(clsw)
        w_parts.append(w)
        lbl_parts.append(label)
        clsw_parts.append(clsw)

    offsets = jnp.concatenate(offs, axis=-1)
    offset_weights = jnp.concatenate(w_parts, axis=-1)
    bucket_labels = jnp.concatenate(lbl_parts, axis=-1)
    cls_weights = jnp.concatenate(clsw_parts, axis=-1)
    return offsets, offset_weights, bucket_labels, cls_weights


def bucket2bbox(proposals: jnp.ndarray, cls_preds: jnp.ndarray,
                offset_preds: jnp.ndarray, num_buckets: int,
                scale_factor: float = 1.0,
                max_hw: Optional[Sequence[int]] = None):
    """SABL decode (bucketing_bbox_coder.py:268-351): per side, take the
    highest-scoring bucket, subtract its fine offset; returns (boxes (n, 4),
    loc_confidence (n,)) with the bucketing-guided rescoring (top-2 scores
    summed when adjacent)."""
    import jax

    n = proposals.shape[0]
    side = int(np.ceil(num_buckets / 2.0))
    scores = jax.nn.softmax(cls_preds.reshape(n, 4, side), axis=-1)
    top2, idx2 = jax.lax.top_k(scores, 2)
    best = idx2[..., 0]                                    # (n, 4)

    bw, bh, _, _, _, _ = _bucket_grid(proposals, num_buckets, scale_factor)
    p = bbox_rescale(proposals, scale_factor)
    steps = 0.5 + best.astype(p.dtype)
    l_b = p[:, 0] + steps[:, 0] * bw
    r_b = p[:, 2] - steps[:, 1] * bw
    t_b = p[:, 1] + steps[:, 2] * bh
    d_b = p[:, 3] - steps[:, 3] * bh

    off = offset_preds.reshape(n, 4, side)
    sel = jnp.take_along_axis(off, best[..., None], axis=-1)[..., 0]
    x1 = l_b - sel[:, 0] * bw
    x2 = r_b - sel[:, 1] * bw
    y1 = t_b - sel[:, 2] * bh
    y2 = d_b - sel[:, 3] * bh
    if max_hw is not None:
        x1 = jnp.clip(x1, 0, max_hw[1] - 1)
        x2 = jnp.clip(x2, 0, max_hw[1] - 1)
        y1 = jnp.clip(y1, 0, max_hw[0] - 1)
        y2 = jnp.clip(y2, 0, max_hw[0] - 1)
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)

    conf = top2[..., 0] + top2[..., 1] * (
        jnp.abs(idx2[..., 0] - idx2[..., 1]) == 1)
    return boxes, conf.mean(axis=-1)


def yolo_encode(anchors: jnp.ndarray, gt_bboxes: jnp.ndarray,
                stride, eps: float = 1e-6) -> jnp.ndarray:
    """YOLOv3 encoding (yolo_bbox_coder.py:31-58): (sig_x, sig_y, log_w,
    log_h) targets; centers expressed as the pre-sigmoid cell fraction
    clamped to (eps, 1-eps)."""
    gcx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) * 0.5
    gcy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) * 0.5
    gw = gt_bboxes[..., 2] - gt_bboxes[..., 0]
    gh = gt_bboxes[..., 3] - gt_bboxes[..., 1]
    acx = (anchors[..., 0] + anchors[..., 2]) * 0.5
    acy = (anchors[..., 1] + anchors[..., 3]) * 0.5
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    wt = jnp.log(jnp.clip(gw / aw, eps, None))
    ht = jnp.log(jnp.clip(gh / ah, eps, None))
    xt = jnp.clip((gcx - acx) / stride + 0.5, eps, 1 - eps)
    yt = jnp.clip((gcy - acy) / stride + 0.5, eps, 1 - eps)
    return jnp.stack([xt, yt, wt, ht], axis=-1)


def yolo_decode(anchors: jnp.ndarray, pred: jnp.ndarray,
                stride) -> jnp.ndarray:
    """YOLOv3 decoding (yolo_bbox_coder.py:60-83): pred[..., :2] are
    POST-sigmoid cell fractions; wh scale the anchor's half-extent."""
    acx = (anchors[..., 0] + anchors[..., 2]) * 0.5
    acy = (anchors[..., 1] + anchors[..., 3]) * 0.5
    cx = acx + (pred[..., 0] - 0.5) * stride
    cy = acy + (pred[..., 1] - 0.5) * stride
    hw_half = (anchors[..., 2] - anchors[..., 0]) * 0.5 * jnp.exp(
        pred[..., 2])
    hh_half = (anchors[..., 3] - anchors[..., 1]) * 0.5 * jnp.exp(
        pred[..., 3])
    return jnp.stack([cx - hw_half, cy - hh_half,
                      cx + hw_half, cy + hh_half], axis=-1)


def legacy_bbox2delta(proposals: jnp.ndarray, gt: jnp.ndarray,
                      means=(0., 0., 0., 0.),
                      stds=(1., 1., 1., 1.)) -> jnp.ndarray:
    """MMDet V1.x delta encoding (legacy_delta_xywh_bbox_coder.py:85-131):
    identical to bbox2delta except widths/heights carry the V1 ``+ 1``
    pixel convention. Only used to run checkpoints trained under mmdet 1.x
    (legacy SSD/RetinaNet configs)."""
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0] + 1.0
    ph = proposals[..., 3] - proposals[..., 1] + 1.0
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0] + 1.0
    gh = gt[..., 3] - gt[..., 1] + 1.0
    deltas = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                        jnp.log(gw / pw), jnp.log(gh / ph)], -1)
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def legacy_delta2bbox(rois: jnp.ndarray, deltas: jnp.ndarray,
                      means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.),
                      max_shape=None,
                      wh_ratio_clip: float = 16 / 1000) -> jnp.ndarray:
    """MMDet V1.x delta decoding (legacy_delta_xywh_bbox_coder.py:134-215):
    V1 ``+ 1`` on the roi wh, and — matching the reference's deliberate
    deviation, documented at its :202-206 — NO ``- 0.5`` when converting
    the center form back to corners. ``deltas`` may be (..., 4*K) for
    per-class regression."""
    means = jnp.tile(jnp.asarray(means, deltas.dtype), deltas.shape[-1] // 4)
    stds = jnp.tile(jnp.asarray(stds, deltas.dtype), deltas.shape[-1] // 4)
    d = deltas * stds + means
    dx, dy, dw, dh = d[..., 0::4], d[..., 1::4], d[..., 2::4], d[..., 3::4]
    max_ratio = abs(float(np.log(wh_ratio_clip)))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    px = ((rois[..., 0] + rois[..., 2]) * 0.5)[..., None]
    py = ((rois[..., 1] + rois[..., 3]) * 0.5)[..., None]
    pw = (rois[..., 2] - rois[..., 0] + 1.0)[..., None]
    ph = (rois[..., 3] - rois[..., 1] + 1.0)[..., None]
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    x1, y1 = gx - gw * 0.5, gy - gh * 0.5
    x2, y2 = gx + gw * 0.5, gy + gh * 0.5
    if max_shape is not None:
        hh, ww = max_shape[0] - 1, max_shape[1] - 1
        x1, x2 = jnp.clip(x1, 0, ww), jnp.clip(x2, 0, ww)
        y1, y2 = jnp.clip(y1, 0, hh), jnp.clip(y2, 0, hh)
    return jnp.stack([x1, y1, x2, y2], -1).reshape(deltas.shape)

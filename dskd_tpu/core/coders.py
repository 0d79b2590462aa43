"""Box coders beyond the delta/distance/integral trio.

Parity targets:
  * TBLR coder — mmdet/core/bbox/coder/tblr_bbox_coder.py:77-206
    (bboxes2tblr / tblr2bboxes): offsets (top, bottom, left, right) from the
    prior center, optionally normalized by the prior's (h, h, w, w) and a
    scalar/4-vector normalizer. Used by FSAF-style heads.
  * YOLO coder — mmdet/core/bbox/coder/yolo_bbox_coder.py:31-83: grid-cell
    sigmoid-center + log-wh parameterization against anchor boxes.

All functions are pure jnp ops over (..., 4) xyxy boxes — vmap/jit friendly,
no dynamic shapes.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp

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

"""Box coordinate transforms and IoU family.

Behavioral parity targets (studied, not copied, from the reference):
  * mmdet/core/bbox/transforms.py (cxcywh<->xyxy converters)
  * mmdet/core/bbox/iou_calculators/iou2d_calculator.py (bbox_overlaps with
    iou/giou/iof modes, aligned and pairwise, eps-guarded union)
"""
from __future__ import annotations

import jax.numpy as jnp


def bbox_cxcywh_to_xyxy(bbox: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) cxcywh -> xyxy."""
    cx, cy, w, h = jnp.split(bbox, 4, axis=-1)
    return jnp.concatenate(
        [cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1)


def bbox_xyxy_to_cxcywh(bbox: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) xyxy -> cxcywh."""
    x1, y1, x2, y2 = jnp.split(bbox, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1)


def bbox_area(bbox: jnp.ndarray) -> jnp.ndarray:
    """Area of (..., 4) xyxy boxes (clamped at 0)."""
    w = jnp.clip(bbox[..., 2] - bbox[..., 0], 0, None)
    h = jnp.clip(bbox[..., 3] - bbox[..., 1], 0, None)
    return w * h


def bbox_overlaps(bboxes1: jnp.ndarray,
                  bboxes2: jnp.ndarray,
                  mode: str = "iou",
                  is_aligned: bool = False,
                  eps: float = 1e-6) -> jnp.ndarray:
    """IoU / GIoU / IoF between two box sets in xyxy format.

    Args:
      bboxes1: (..., M, 4). bboxes2: (..., N, 4) (or (..., M, 4) if aligned).
      mode: 'iou', 'iof' or 'giou'.
      is_aligned: if True, computes elementwise overlaps of equal-length sets.

    Returns:
      (..., M, N) or (..., M) if aligned.
    """
    assert mode in ("iou", "iof", "giou"), mode
    area1 = bbox_area(bboxes1)
    area2 = bbox_area(bboxes2)

    if not is_aligned:
        b1 = bboxes1[..., :, None, :]
        b2 = bboxes2[..., None, :, :]
        area1 = area1[..., :, None]
        area2 = area2[..., None, :]
    else:
        b1, b2 = bboxes1, bboxes2

    lt = jnp.maximum(b1[..., :2], b2[..., :2])
    rb = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    overlap = wh[..., 0] * wh[..., 1]

    if mode == "iof":
        union = area1
    else:
        union = area1 + area2 - overlap
    union = jnp.maximum(union, eps)
    ious = overlap / union
    if mode in ("iou", "iof"):
        return ious

    # giou
    enclose_lt = jnp.minimum(b1[..., :2], b2[..., :2])
    enclose_rb = jnp.maximum(b1[..., 2:], b2[..., 2:])
    enclose_wh = jnp.clip(enclose_rb - enclose_lt, 0, None)
    enclose_area = jnp.maximum(enclose_wh[..., 0] * enclose_wh[..., 1], eps)
    return ious - (enclose_area - union) / enclose_area


def bbox_clip(bbox: jnp.ndarray, img_hw) -> jnp.ndarray:
    """Clip xyxy boxes to [0, w] x [0, h]. img_hw = (h, w) scalars/arrays."""
    h, w = img_hw
    x1 = jnp.clip(bbox[..., 0], 0, w)
    y1 = jnp.clip(bbox[..., 1], 0, h)
    x2 = jnp.clip(bbox[..., 2], 0, w)
    y2 = jnp.clip(bbox[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def distance2bbox(points: jnp.ndarray, distance: jnp.ndarray,
                  max_shape=None) -> jnp.ndarray:
    """(..., 2) centers + (..., 4) l,t,r,b distances -> xyxy
    (parity: mmdet core/bbox/transforms.py distance2bbox)."""
    x1 = points[..., 0] - distance[..., 0]
    y1 = points[..., 1] - distance[..., 1]
    x2 = points[..., 0] + distance[..., 2]
    y2 = points[..., 1] + distance[..., 3]
    out = jnp.stack([x1, y1, x2, y2], -1)
    if max_shape is not None:
        h, w = max_shape
        out = jnp.stack([jnp.clip(out[..., 0], 0, w),
                         jnp.clip(out[..., 1], 0, h),
                         jnp.clip(out[..., 2], 0, w),
                         jnp.clip(out[..., 3], 0, h)], -1)
    return out


def bbox2distance(points: jnp.ndarray, bbox: jnp.ndarray,
                  max_dis: float = None, eps: float = 0.1) -> jnp.ndarray:
    """xyxy boxes -> l,t,r,b distances from centers, clipped to
    [0, max_dis - eps] (parity: mmdet bbox2distance for the DFL target)."""
    left = points[..., 0] - bbox[..., 0]
    top = points[..., 1] - bbox[..., 1]
    right = bbox[..., 2] - points[..., 0]
    bottom = bbox[..., 3] - points[..., 1]
    d = jnp.stack([left, top, right, bottom], -1)
    if max_dis is not None:
        d = jnp.clip(d, 0, max_dis - eps)
    return d


def bbox_flip_horizontal(bbox: jnp.ndarray, img_w) -> jnp.ndarray:
    """Horizontally flip xyxy boxes within an image of width ``img_w``."""
    x1 = img_w - bbox[..., 2]
    x2 = img_w - bbox[..., 0]
    return jnp.stack([x1, bbox[..., 1], x2, bbox[..., 3]], axis=-1)

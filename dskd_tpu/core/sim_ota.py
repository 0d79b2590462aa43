"""SimOTA assigner (parity: mmdet/core/bbox/assigners/sim_ota_assigner.py).

Dynamic-k optimal transport approximation used by the YOLOX/YOLOY family:
candidates must be inside a GT box or its center region (radius 2.5
strides); cost = BCE(sqrt(cls*obj), onehot*1) + 3 * (-log IoU) + INF outside
the center intersection; each GT takes dynamic_k = clamp(sum of its top-10
IoUs, >=1) lowest-cost candidates; conflicts resolve to the min-cost GT.

Static-shape version with padded GT.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps

_INF = 1e8
_EPS = 1e-7


class SimOTAResult(NamedTuple):
    assigned_gt: jnp.ndarray   # (N,) gt index or -1
    labels: jnp.ndarray        # (N,) label or num_classes
    pos_mask: jnp.ndarray      # (N,)
    max_ious: jnp.ndarray      # (N,) IoU with the assigned gt (0 for neg)
    num_pos: jnp.ndarray       # ()


def sim_ota_assign(pred_scores: jnp.ndarray, priors: jnp.ndarray,
                   decoded_bboxes: jnp.ndarray, gt_bboxes: jnp.ndarray,
                   gt_labels: jnp.ndarray, gt_valid: jnp.ndarray,
                   num_classes: int, center_radius: float = 2.5,
                   candidate_topk: int = 10, iou_weight: float = 3.0,
                   cls_weight: float = 1.0) -> SimOTAResult:
    """One image. pred_scores: (N, C) sigmoid(cls)*sigmoid(obj) (detached);
    priors: (N, 4) [cx, cy, stride_w, stride_h] with the 0.5 offset applied;
    decoded_bboxes: (N, 4) xyxy (detached)."""
    N = priors.shape[0]
    G = gt_bboxes.shape[0]

    cx, cy = priors[:, 0], priors[:, 1]
    sw, sh = priors[:, 2], priors[:, 3]
    in_box = ((cx[:, None] > gt_bboxes[None, :, 0])
              & (cx[:, None] < gt_bboxes[None, :, 2])
              & (cy[:, None] > gt_bboxes[None, :, 1])
              & (cy[:, None] < gt_bboxes[None, :, 3]))
    gcx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2
    gcy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2
    in_center = ((cx[:, None] > gcx[None] - center_radius * sw[:, None])
                 & (cx[:, None] < gcx[None] + center_radius * sw[:, None])
                 & (cy[:, None] > gcy[None] - center_radius * sh[:, None])
                 & (cy[:, None] < gcy[None] + center_radius * sh[:, None]))
    valid_prior = (in_box | in_center).any(axis=1)          # (N,)
    in_both = in_box & in_center                            # (N, G)

    ious = bbox_overlaps(decoded_bboxes, gt_bboxes)         # (N, G)
    iou_cost = -jnp.log(ious + _EPS)

    safe_labels = jnp.clip(gt_labels, 0, num_classes - 1)
    onehot = jax.nn.one_hot(safe_labels, num_classes)       # (G, C)
    sq = jnp.sqrt(jnp.clip(pred_scores, _EPS, 1.0))         # (N, C)
    # BCE(sq, onehot) summed over classes, per (prior, gt)
    bce_pos = -jnp.log(sq)                                  # target 1 part
    bce_neg = -jnp.log(jnp.clip(1 - sq, _EPS, None))        # target 0 part
    cls_cost = bce_pos @ onehot.T + bce_neg @ (1 - onehot).T  # (N, G)

    cost = (cls_weight * cls_cost + iou_weight * iou_cost
            + jnp.where(in_both, 0.0, _INF)
            + jnp.where(valid_prior[:, None], 0.0, _INF)
            + jnp.where(gt_valid[None], 0.0, _INF))

    # dynamic k per gt from the top-10 candidate IoUs
    masked_ious = jnp.where(valid_prior[:, None] & gt_valid[None], ious, 0.0)
    k = min(candidate_topk, N)
    topk_ious = jax.lax.top_k(masked_ious.T, k)[0]          # (G, k)
    dynamic_ks = jnp.clip(topk_ious.sum(1).astype(jnp.int32), 1, None)

    # rank of each prior's cost per gt; selected if rank < dynamic_k
    order = jnp.argsort(cost, axis=0)                       # (N, G)
    ranks = jnp.zeros((N, G), jnp.int32)
    ranks = jax.vmap(
        lambda o: jnp.zeros((N,), jnp.int32).at[o].set(
            jnp.arange(N, dtype=jnp.int32)), in_axes=1, out_axes=1)(order)
    selected = (ranks < dynamic_ks[None]) & (cost < _INF)   # (N, G)

    # conflicts: keep the min-cost gt
    sel_cost = jnp.where(selected, cost, _INF)
    assigned = jnp.argmin(sel_cost, axis=1).astype(jnp.int32)
    pos = selected.any(axis=1)
    assigned = jnp.where(pos, assigned, -1)
    safe = jnp.clip(assigned, 0, G - 1)
    labels = jnp.where(pos, gt_labels[safe].astype(jnp.int32), num_classes)
    max_ious = jnp.where(pos, ious[jnp.arange(N), safe], 0.0)
    return SimOTAResult(assigned, labels, pos, max_ious,
                        pos.sum().astype(jnp.int32))

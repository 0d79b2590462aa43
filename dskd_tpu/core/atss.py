"""ATSS assigner (parity: mmdet/core/bbox/assigners/atss_assigner.py).

Adaptive sample selection: per GT, take the topk closest anchors (by
center distance) FROM EACH LEVEL as candidates; the positive-IoU threshold
is mean+std of the candidate IoUs; candidates must also have their anchor
center inside the GT. Conflicts resolve to the highest-IoU GT.

Static-shape version for padded GT. Level boundaries are static ints.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps


class ATSSAssignResult(NamedTuple):
    assigned_gt: jnp.ndarray   # (N,) gt index or -1
    labels: jnp.ndarray        # (N,) label or num_classes (bg)
    pos_mask: jnp.ndarray      # (N,)


def atss_assign(anchors: jnp.ndarray, num_level_anchors: Sequence[int],
                gt_bboxes: jnp.ndarray, gt_labels: jnp.ndarray,
                gt_valid: jnp.ndarray, num_classes: int,
                topk: int = 9) -> ATSSAssignResult:
    """One image. anchors: (N, 4) xyxy; gt: (G, ...) padded."""
    N = anchors.shape[0]
    G = gt_bboxes.shape[0]

    ious = bbox_overlaps(anchors, gt_bboxes)                 # (N, G)
    anchor_cxy = jnp.stack([(anchors[:, 0] + anchors[:, 2]) / 2,
                            (anchors[:, 1] + anchors[:, 3]) / 2], -1)
    gt_cxy = jnp.stack([(gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2,
                        (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2], -1)
    dist = jnp.sqrt(((anchor_cxy[:, None] - gt_cxy[None]) ** 2).sum(-1))

    # per level, topk closest anchors per gt
    cand_idx = []
    start = 0
    for n in num_level_anchors:
        k = min(topk, n)
        d = dist[start:start + n]                            # (n, G)
        idx = jax.lax.top_k(-d.T, k)[1] + start              # (G, k)
        cand_idx.append(idx)
        start += n
    cand_idx = jnp.concatenate(cand_idx, axis=1)             # (G, K)
    K = cand_idx.shape[1]

    cand_ious = jnp.take_along_axis(ious.T, cand_idx, axis=1)  # (G, K)
    # torch .std() is the UNBIASED (n-1) estimator — ddof=1 keeps the
    # mean+std positive threshold bit-aligned with atss_assigner.py
    thr = cand_ious.mean(1) + cand_ious.std(1, ddof=1)       # (G,)

    # candidate centers inside gt
    cx = anchor_cxy[cand_idx]                                # (G, K, 2)
    inside = ((cx[..., 0] > gt_bboxes[:, None, 0])
              & (cx[..., 0] < gt_bboxes[:, None, 2])
              & (cx[..., 1] > gt_bboxes[:, None, 1])
              & (cx[..., 1] < gt_bboxes[:, None, 3]))
    is_pos = (cand_ious >= thr[:, None]) & inside & gt_valid[:, None]

    # conflicts -> gt with max IoU; build (N, G) claim matrix
    claims = jnp.zeros((N, G), bool)
    g_ids = jnp.tile(jnp.arange(G, dtype=jnp.int32)[:, None], (1, K))
    flat_a = jnp.where(is_pos, cand_idx, N).reshape(-1)      # drop negatives
    claims = claims.at[flat_a, g_ids.reshape(-1)].set(True, mode="drop")

    claimed_iou = jnp.where(claims, ious, -1.0)
    assigned = jnp.argmax(claimed_iou, axis=1).astype(jnp.int32)
    pos = claims.any(axis=1)
    assigned = jnp.where(pos, assigned, -1)
    labels = jnp.where(pos, gt_labels[jnp.clip(assigned, 0, G - 1)]
                       .astype(jnp.int32), num_classes)
    return ATSSAssignResult(assigned, labels, pos)

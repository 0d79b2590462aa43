"""UniformAssigner (parity: mmdet/core/bbox/assigners/uniform_assigner.py).

YOLOF's prediction-aware uniform matching: each GT takes its match_times
nearest predicted boxes AND match_times nearest anchors by cxcywh-L1 cost;
candidates with anchor-GT IoU < pos_ignore_thr are ignored; predictions
whose max GT IoU exceeds neg_ignore_thr are removed from the negatives.

Static-shape port notes:
  * the reference's sequential scatter (later GTs overwrite earlier ones at
    a shared anchor) is reproduced deterministically via a last-wins
    segment-max over candidate positions;
  * padded GTs contribute masked-out candidates.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps, bbox_xyxy_to_cxcywh


class UniformAssignResult(NamedTuple):
    labels: jnp.ndarray        # (N,) int32, assigned label; bg = num_classes
    label_weights: jnp.ndarray  # (N,) f32: 1 pos/neg, 0 ignored
    cand_anchor_idx: jnp.ndarray  # (2k*G,) candidate anchor index
    cand_gt_idx: jnp.ndarray      # (2k*G,) candidate gt index
    cand_pos_mask: jnp.ndarray    # (2k*G,) bool: counted in bbox loss
    num_pos: jnp.ndarray          # () number of anchors with a positive gt


def uniform_assign(bbox_pred: jnp.ndarray, anchors: jnp.ndarray,
                   gt_bboxes: jnp.ndarray, gt_labels: jnp.ndarray,
                   gt_valid: jnp.ndarray, num_classes: int,
                   match_times: int = 4, pos_ignore_thr: float = 0.15,
                   neg_ignore_thr: float = 0.7) -> UniformAssignResult:
    """One image. bbox_pred/anchors: (N, 4) xyxy; gt_*: (G, ...) padded."""
    N = bbox_pred.shape[0]
    G = gt_bboxes.shape[0]
    k = match_times

    pred_c = bbox_xyxy_to_cxcywh(bbox_pred)
    anc_c = bbox_xyxy_to_cxcywh(anchors)
    gt_c = bbox_xyxy_to_cxcywh(gt_bboxes)

    cost_pred = jnp.abs(pred_c[:, None] - gt_c[None]).sum(-1)   # (N, G)
    cost_anc = jnp.abs(anc_c[:, None] - gt_c[None]).sum(-1)

    # smallest-k rows per gt column
    idx_pred = jax.lax.top_k(-cost_pred.T, k)[1]                # (G, k)
    idx_anc = jax.lax.top_k(-cost_anc.T, k)[1]                  # (G, k)
    # reference order: cat((index, index1), dim=1).reshape(-1) over (k, 2G)
    # == for each of k rounds: preds of all gts, then anchors of all gts
    indexes = jnp.concatenate([idx_pred.T, idx_anc.T], axis=1).reshape(-1)
    cand_gt = jnp.tile(jnp.arange(G, dtype=jnp.int32), 2 * k)   # (2kG,)

    pred_overlaps = bbox_overlaps(bbox_pred, gt_bboxes)         # (N, G)
    anchor_overlaps = bbox_overlaps(anchors, gt_bboxes)
    pred_max = jnp.where(gt_valid[None], pred_overlaps, 0.0).max(-1)

    pos_ious = anchor_overlaps[indexes, cand_gt]
    cand_valid = gt_valid[cand_gt]
    pos_ignore = (pos_ious < pos_ignore_thr) | ~cand_valid

    # assigned value per candidate: gt+1, or -1 if pos-ignored
    cand_val = jnp.where(pos_ignore, -1, cand_gt + 1)

    # base: 0 everywhere, -1 where pred_max > neg_ignore_thr
    base = jnp.where(pred_max > neg_ignore_thr, -1, 0).astype(jnp.int32)

    # last-wins scatter of candidates (skip invalid-gt candidates entirely:
    # the reference never emits them since its G is the true count)
    order = jnp.arange(indexes.shape[0], dtype=jnp.int32)
    scatter_idx = jnp.where(cand_valid, indexes, N)             # drop pads
    last = jnp.full((N,), -1, jnp.int32).at[scatter_idx].max(
        order, mode="drop")
    assigned = jnp.where(last >= 0, cand_val[jnp.clip(last, 0, None)], base)

    pos_mask = assigned > 0
    safe_gt = jnp.clip(assigned - 1, 0, G - 1)
    labels = jnp.where(pos_mask, gt_labels[safe_gt].astype(jnp.int32),
                       num_classes)
    label_weights = (pos_mask | (assigned == 0)).astype(jnp.float32)
    num_pos = pos_mask.sum()

    return UniformAssignResult(labels, label_weights, indexes, cand_gt,
                               (~pos_ignore) & cand_valid, num_pos)

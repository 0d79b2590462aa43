"""MaxIoUAssigner + RandomSampler (parity: mmdet max_iou_assigner.py /
random_sampler.py) under static shapes.

MaxIoU: anchors with max-GT IoU >= pos_iou_thr are positive (to their
argmax GT); < neg_iou_thr are negative; in between are ignored.
``match_low_quality`` additionally assigns each GT its highest-IoU anchor
(if >= min_pos_iou), possibly stealing — the reference applies this AFTER
the threshold pass so it wins (gt order: later GTs overwrite).

RandomSampler: sample at most num*pos_fraction positives and fill the rest
with negatives, uniformly at random — here via random keys + top_k, fixed
output size with validity masks.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps


class MaxIoUResult(NamedTuple):
    assigned_gt: jnp.ndarray   # (N,) gt idx, -1 neg, -2 ignore
    labels: jnp.ndarray        # (N,) label or num_classes for neg
    max_ious: jnp.ndarray      # (N,)


def max_iou_assign(boxes: jnp.ndarray, gt_bboxes: jnp.ndarray,
                   gt_labels: jnp.ndarray, gt_valid: jnp.ndarray,
                   num_classes: int, pos_iou_thr: float = 0.7,
                   neg_iou_thr: float = 0.3, min_pos_iou: float = 0.3,
                   match_low_quality: bool = True) -> MaxIoUResult:
    N = boxes.shape[0]
    G = gt_bboxes.shape[0]
    ious = jnp.where(gt_valid[None], bbox_overlaps(boxes, gt_bboxes), -1.0)
    max_iou = ious.max(axis=1)
    argmax_gt = jnp.argmax(ious, axis=1).astype(jnp.int32)

    assigned = jnp.where(max_iou >= pos_iou_thr, argmax_gt, -1)
    ignore = (max_iou >= neg_iou_thr) & (max_iou < pos_iou_thr)
    assigned = jnp.where(ignore, -2, assigned)

    if match_low_quality:
        # per gt: its best anchor (ties: first), applied in gt order
        gt_best_iou = ious.max(axis=0)                       # (G,)
        gt_best_anchor = jnp.argmax(ious, axis=0)            # (G,)
        ok = gt_valid & (gt_best_iou >= min_pos_iou)
        scatter_idx = jnp.where(ok, gt_best_anchor, N)
        # later gts overwrite earlier: scatter in increasing g order
        assigned = assigned.at[scatter_idx].set(
            jnp.arange(G, dtype=jnp.int32), mode="drop")

    pos = assigned >= 0
    safe = jnp.clip(assigned, 0, G - 1)
    labels = jnp.where(pos, gt_labels[safe].astype(jnp.int32), num_classes)
    return MaxIoUResult(assigned, labels, max_iou)


class SampleResult(NamedTuple):
    pos_idx: jnp.ndarray    # (num_pos_max,) indices (masked)
    pos_valid: jnp.ndarray
    neg_idx: jnp.ndarray    # (num_neg_max,)
    neg_valid: jnp.ndarray


def random_sample(rng, assigned_gt: jnp.ndarray, num: int,
                  pos_fraction: float) -> SampleResult:
    """Sample pos/neg indices with fixed output sizes.

    Matches RandomSampler semantics: up to num*pos_fraction positives; the
    remainder filled with negatives (the reference does not re-grow the
    positive share when negatives are scarce)."""
    N = assigned_gt.shape[0]
    num_pos_max = int(num * pos_fraction)
    num_neg_max = num - num_pos_max

    pos_mask = assigned_gt >= 0
    neg_mask = assigned_gt == -1
    r1, r2 = jax.random.split(rng)
    pos_keys = jnp.where(pos_mask, jax.random.uniform(r1, (N,)), -1.0)
    neg_keys = jnp.where(neg_mask, jax.random.uniform(r2, (N,)), -1.0)
    pos_vals, pos_idx = jax.lax.top_k(pos_keys, num_pos_max)
    neg_vals, neg_idx = jax.lax.top_k(neg_keys, num_neg_max)
    return SampleResult(pos_idx.astype(jnp.int32), pos_vals > 0,
                        neg_idx.astype(jnp.int32), neg_vals > 0)


def ohem_sample(per_roi_loss: jnp.ndarray, assigned_gt: jnp.ndarray,
                num: int, pos_fraction: float) -> SampleResult:
    """Online hard example mining (OHEMSampler, samplers/ohem_sampler.py:
    12-111) under static shapes.

    Where RandomSampler draws uniformly, OHEM keeps the TOP-LOSS rois:
    positives (assigned) and negatives (assigned_gt == -1, i.e. background)
    are ranked separately by ``per_roi_loss`` (the reference's
    reduction_override='none' classification loss re-forwarded through the
    head — here the caller computes it from the current logits, no second
    forward needed under one jitted step) and the hardest num*pos_fraction
    positives + remainder negatives are taken. Scarce groups report
    invalid slots, exactly like random_sample.
    """
    N = assigned_gt.shape[0]
    num_pos_max = int(num * pos_fraction)
    num_neg_max = num - num_pos_max

    neg_inf = jnp.asarray(-jnp.inf, per_roi_loss.dtype)
    pos_keys = jnp.where(assigned_gt >= 0, per_roi_loss, neg_inf)
    neg_keys = jnp.where(assigned_gt == -1, per_roi_loss, neg_inf)
    pos_vals, pos_idx = jax.lax.top_k(pos_keys, num_pos_max)
    neg_vals, neg_idx = jax.lax.top_k(neg_keys, num_neg_max)
    return SampleResult(pos_idx.astype(jnp.int32),
                        jnp.isfinite(pos_vals),
                        neg_idx.astype(jnp.int32),
                        jnp.isfinite(neg_vals))


def iou_balanced_sample(rng, assigned_gt: jnp.ndarray,
                        max_ious: jnp.ndarray, num: int,
                        pos_fraction: float,
                        num_bins: int = 3,
                        neg_iou_ub: float = 0.5) -> SampleResult:
    """IoUBalancedNegSampler (Libra R-CNN, samplers/
    iou_balanced_neg_sampler.py): negatives are drawn EVENLY from
    ``num_bins`` IoU intervals over [0, neg_iou_ub) instead of uniformly —
    hard negatives (higher IoU) stop being swamped by easy ones. Static
    shapes: per-bin top-k quotas with a global fallback fill."""
    N = assigned_gt.shape[0]
    num_pos_max = int(num * pos_fraction)
    num_neg_max = num - num_pos_max

    pos_mask = assigned_gt >= 0
    neg_mask = assigned_gt == -1
    keys = jax.random.split(rng, num_bins + 2)
    pos_keys = jnp.where(pos_mask, jax.random.uniform(keys[0], (N,)), -1.0)
    pos_vals, pos_idx = jax.lax.top_k(pos_keys, num_pos_max)

    quota = num_neg_max // num_bins
    taken = jnp.zeros((N,), bool)
    neg_parts_idx, neg_parts_val = [], []
    for b in range(num_bins):
        lo = neg_iou_ub * b / num_bins
        hi = neg_iou_ub * (b + 1) / num_bins
        in_bin = neg_mask & (max_ious >= lo) & (max_ious < hi)
        k = jnp.where(in_bin, jax.random.uniform(keys[1 + b], (N,)), -1.0)
        v, i = jax.lax.top_k(k, quota)
        neg_parts_idx.append(i)
        neg_parts_val.append(v)
        taken = taken.at[jnp.where(v > 0, i, N)].set(True, mode="drop")
    # fallback fill: any remaining negatives for the residual quota
    rest = num_neg_max - num_bins * quota
    k = jnp.where(neg_mask & ~taken,
                  jax.random.uniform(keys[-1], (N,)), -1.0)
    v, i = jax.lax.top_k(k, num_neg_max)   # oversized pool for refills
    # fill shortfalls: concatenate bins then fallback, keep first num_neg
    all_idx = jnp.concatenate(neg_parts_idx + [i])
    all_val = jnp.concatenate(neg_parts_val + [v])
    order = jnp.argsort(~(all_val > 0))    # valid picks first, stable
    neg_idx = all_idx[order][:num_neg_max]
    neg_val = all_val[order][:num_neg_max]
    return SampleResult(pos_idx.astype(jnp.int32), pos_vals > 0,
                        neg_idx.astype(jnp.int32), neg_val > 0)

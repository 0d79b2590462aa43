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
    ious = bbox_overlaps(boxes, gt_bboxes)
    return max_iou_assign_ious(ious, gt_labels, gt_valid, num_classes,
                               pos_iou_thr=pos_iou_thr,
                               neg_iou_thr=neg_iou_thr,
                               min_pos_iou=min_pos_iou,
                               match_low_quality=match_low_quality)


def max_iou_assign_ious(ious: jnp.ndarray, gt_labels: jnp.ndarray,
                        gt_valid: jnp.ndarray, num_classes: int,
                        pos_iou_thr: float = 0.7, neg_iou_thr: float = 0.3,
                        min_pos_iou: float = 0.3,
                        match_low_quality: bool = True) -> MaxIoUResult:
    """MaxIoU assignment from a precomputed (N, G) overlap matrix — the
    ApproxMaxIoUAssigner (approx_max_iou_assigner.py) is exactly this on
    the per-square max over its 9 approx anchors."""
    N, G = ious.shape
    ious = jnp.where(gt_valid[None], ious, -1.0)
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


def instance_balanced_sample(rng, assigned_gt: jnp.ndarray, num: int,
                             pos_fraction: float) -> SampleResult:
    """InstanceBalancedPosSampler (samplers/
    instance_balanced_pos_sampler.py:14-56): positives are drawn evenly
    ACROSS GT instances instead of uniformly over anchors.

    Static-shape formulation: each positive gets a random within-instance
    rank; selection proceeds round-robin by rank (every instance's rank-0
    anchor first, then rank-1, ...), which yields the reference's
    per-instance balance without its dynamic num_per_gt quota + refill
    loop (a deterministic-fairer restatement, documented deviation).
    Negatives are uniform, as in the reference (it subclasses
    RandomSampler for the negative half)."""
    N = assigned_gt.shape[0]
    num_pos_max = int(num * pos_fraction)
    num_neg_max = num - num_pos_max

    pos_mask = assigned_gt >= 0
    r1, r2 = jax.random.split(rng)
    u = jax.random.uniform(r1, (N,))
    # within-instance rank: # of same-instance positives with a larger key
    same = (assigned_gt[:, None] == assigned_gt[None, :]) \
        & pos_mask[:, None] & pos_mask[None, :]
    rank = (same & (u[None, :] > u[:, None])).sum(-1)        # (N,)
    # round-robin key: lower rank strictly wins; ties broken by u
    key = jnp.where(pos_mask, -rank.astype(jnp.float32) + u * 0.5,
                    -jnp.inf)
    pos_vals, pos_idx = jax.lax.top_k(key, num_pos_max)

    neg_keys = jnp.where(assigned_gt == -1,
                         jax.random.uniform(r2, (N,)), -1.0)
    neg_vals, neg_idx = jax.lax.top_k(neg_keys, num_neg_max)
    return SampleResult(pos_idx.astype(jnp.int32),
                        jnp.isfinite(pos_vals),
                        neg_idx.astype(jnp.int32), neg_vals > 0)


class ScoreHLRResult(NamedTuple):
    sample: SampleResult
    neg_label_weights: jnp.ndarray   # (num_neg_max,) ISR-N weights


def score_hlr_sample(rng, assigned_gt: jnp.ndarray,
                     neg_max_score: jnp.ndarray,
                     neg_boxes: jnp.ndarray,
                     neg_ori_loss: jnp.ndarray,
                     num: int, pos_fraction: float, k: float = 0.5,
                     bias: float = 0.0, score_thr: float = 0.05,
                     iou_thr: float = 0.5) -> ScoreHLRResult:
    """ScoreHLRSampler (samplers/score_hlr_sampler.py:102-215, the ISR-N
    half of Prime Sample Attention) under static shapes.

    Inputs are per-ROW (aligned with ``assigned_gt``): the max foreground
    softmax score of each row under the current head
    (``neg_max_score``), its argmax-class decoded box (``neg_boxes``) and
    its background-CE loss (``neg_ori_loss``) — the caller computes them
    with a stop-gradient head pass, replacing the reference's extra
    no-grad ``_bbox_forward``. Rows that are not negatives are ignored.

    Positives are uniform-random (reference ``_sample_pos``). Negatives:
    valid = score > score_thr; NMS-match groups the valid ones; the
    importance ``num_valid - within_group_rank + score`` ranks them
    hierarchically; the top ``num_expected`` by importance are taken,
    shortfall filled randomly from the invalid pool; per-slot label
    weights follow the reference's linear map + (bias, k) power +
    loss-sum renormalization."""
    N = assigned_gt.shape[0]
    num_pos_max = int(num * pos_fraction)
    num_neg_max = num - num_pos_max

    r1, r2 = jax.random.split(rng)
    pos_keys = jnp.where(assigned_gt >= 0,
                         jax.random.uniform(r1, (N,)), -1.0)
    pos_vals, pos_idx = jax.lax.top_k(pos_keys, num_pos_max)

    neg_mask = assigned_gt == -1
    valid = neg_mask & (neg_max_score > score_thr)
    num_valid = valid.sum()

    from .postprocess import nms_match_groups
    group = nms_match_groups(neg_boxes, jnp.where(valid, neg_max_score,
                                                  -1.0), valid, iou_thr)
    # within-group rank by score (keeper = rank 0)
    same_g = (group[:, None] == group[None, :]) \
        & valid[:, None] & valid[None, :]
    g_rank = (same_g
              & (neg_max_score[None, :] > neg_max_score[:, None])).sum(-1)
    imp = jnp.where(valid,
                    num_valid.astype(jnp.float32)
                    - g_rank.astype(jnp.float32) + neg_max_score, -jnp.inf)
    # global rank of each valid row by importance (descending)
    imp_rank = ((valid[None, :] & (imp[None, :] > imp[:, None]))
                .sum(-1)).astype(jnp.float32)

    # selection: valid rows by importance first, then random invalid fill
    imp_f = jnp.where(valid, imp, 0.0)         # strip the -inf fillers
    norm = jnp.maximum(jnp.abs(imp_f).max(), 1.0)
    sel_key = jnp.where(valid, 2.0 + imp_f / norm,
                        jnp.where(neg_mask,
                                  jax.random.uniform(r2, (N,)), -jnp.inf))
    sel_vals, neg_idx = jax.lax.top_k(sel_key, num_neg_max)
    neg_valid = jnp.isfinite(sel_vals)
    is_hlr = sel_vals > 1.5

    num_expected = jnp.minimum(neg_mask.sum(), num_neg_max)
    up_bound = jnp.maximum(num_expected, num_valid).astype(jnp.float32)
    w_sel = (up_bound - imp_rank[neg_idx]) / jnp.maximum(up_bound, 1.0)
    w_min = jnp.where(is_hlr.any(),
                      jnp.where(is_hlr, w_sel, jnp.inf).min(), 1.0)
    w = jnp.where(is_hlr, w_sel, w_min)
    w = (bias + (1.0 - bias) * w) ** k
    # renormalize so the reweighted loss sum matches the original
    sel_loss = neg_ori_loss[neg_idx] * neg_valid
    ratio = sel_loss.sum() / jnp.maximum((sel_loss * w).sum(), 1e-12)
    w = jnp.where(neg_valid, w * ratio, 0.0)
    sample = SampleResult(pos_idx.astype(jnp.int32), pos_vals > 0,
                          neg_idx.astype(jnp.int32), neg_valid)
    return ScoreHLRResult(sample, w)

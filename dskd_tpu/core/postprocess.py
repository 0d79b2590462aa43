"""Static-shape post-processing: score filtering, top-k, NMS.

``filter_scores_and_topk`` mirrors the reference helper
(mmdet/core/utils/misc.py:119-160) under static shapes: instead of boolean
indexing it returns fixed-size top-k results plus a validity mask (entries
that fail the score threshold or exceed the valid count are masked).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TopkResult(NamedTuple):
    scores: jnp.ndarray    # (k,) float
    labels: jnp.ndarray    # (k,) int32
    keep_idxs: jnp.ndarray  # (k,) int32 index into the first axis of `scores`
    valid: jnp.ndarray     # (k,) bool


def filter_scores_and_topk(scores: jnp.ndarray, score_thr: float,
                           topk: int) -> TopkResult:
    """Threshold + top-k over a (N, K) score matrix, static shapes.

    Matches the reference semantics: flatten all (box, class) pairs, drop
    pairs <= score_thr, keep the top ``topk`` by score. Thresholded-out or
    absent entries are reported with valid=False.
    """
    n, k = scores.shape
    flat = scores.reshape(-1)
    mask = flat > score_thr
    cand = jnp.where(mask, flat, -1.0)
    kk = min(topk, n * k)
    top_scores, top_idx = jax.lax.top_k(cand, kk)
    if kk < topk:  # keep the static output size contract
        top_scores = jnp.pad(top_scores, (0, topk - kk),
                             constant_values=-1.0)
        top_idx = jnp.pad(top_idx, (0, topk - kk))
    valid = top_scores > jnp.maximum(score_thr, -0.5)
    keep_idxs = (top_idx // k).astype(jnp.int32)
    labels = (top_idx % k).astype(jnp.int32)
    return TopkResult(top_scores, labels, keep_idxs, valid)


def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray, labels: jnp.ndarray,
                iou_thr: float, max_out: int, valid=None):
    """Class-aware NMS with static output size (for the CNN-head families).

    Uses the class-offset trick: boxes of different classes are translated to
    disjoint regions so one class-agnostic pass suffices, then iterative
    suppression runs as a fixed-length scan over score-sorted candidates.

    Returns (boxes, scores, labels, keep_mask, src_idx) with first axis
    ``max_out``; src_idx maps each output slot to its input row (for
    teacher keep-id tracking).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    offset = labels.astype(boxes.dtype)[:, None] * (
        jnp.max(jnp.abs(boxes)) + 1.0)
    shifted = boxes + offset

    order = jnp.argsort(jnp.where(valid, -scores, jnp.inf))
    shifted = shifted[order]
    sboxes, sscores, slabels = boxes[order], scores[order], labels[order]
    svalid = valid[order]

    x1, y1, x2, y2 = [shifted[:, i] for i in range(4)]
    area = jnp.clip(x2 - x1, 0, None) * jnp.clip(y2 - y1, 0, None)

    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.clip(ix2 - ix1, 0, None) * jnp.clip(iy2 - iy1, 0, None)
    iou = inter / jnp.clip(area[:, None] + area[None, :] - inter, 1e-6, None)

    def body(i, keep):
        sup = (iou[i] > iou_thr) & keep & (jnp.arange(n) > i)
        return jnp.where(keep[i], keep & ~sup, keep)

    keep = jax.lax.fori_loop(0, n, body, svalid)
    # compact the kept entries to the front deterministically
    rank = jnp.argsort(jnp.where(keep, -sscores, jnp.inf))[:max_out]
    out_keep = keep[rank]
    src_idx = order[rank]  # original row of each output slot
    return (sboxes[rank], jnp.where(out_keep, sscores[rank], 0.0),
            slabels[rank], out_keep, src_idx)

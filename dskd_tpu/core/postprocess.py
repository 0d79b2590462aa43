"""Static-shape post-processing: score filtering, top-k, NMS.

``filter_scores_and_topk`` mirrors the reference helper
(mmdet/core/utils/misc.py:119-160) under static shapes: instead of boolean
indexing it returns fixed-size top-k results plus a validity mask (entries
that fail the score threshold or exceed the valid count are masked).
"""
from __future__ import annotations

from typing import NamedTuple

import os

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
    if (os.environ.get("DSKD_APPROX_TOPK", "0") == "1"
            and jax.default_backend() == "tpu" and kk < n * k):
        # TPU-optimized approximate top-k (recall >= 0.95): the exact
        # lax.top_k lowers to a full sort; for teacher-det selection the
        # tail of near-threshold detections is noise-dominated anyway.
        top_scores, top_idx = jax.lax.approx_max_k(cand, kk)
    else:
        top_scores, top_idx = jax.lax.top_k(cand, kk)
    if kk < topk:  # keep the static output size contract
        top_scores = jnp.pad(top_scores, (0, topk - kk),
                             constant_values=-1.0)
        top_idx = jnp.pad(top_idx, (0, topk - kk))
    valid = top_scores > jnp.maximum(score_thr, -0.5)
    keep_idxs = (top_idx // k).astype(jnp.int32)
    labels = (top_idx % k).astype(jnp.int32)
    return TopkResult(top_scores, labels, keep_idxs, valid)


def filter_scores_and_topk_mlvl(scores: jnp.ndarray, score_thr: float,
                                topk: int, level_sizes) -> TopkResult:
    """Per-LEVEL threshold + top-k, the reference's decode protocol:
    ``nms_pre`` applies to each pyramid level independently
    (_get_bboxes_single loops levels; filter_scores_and_topk at each),
    so up to ``topk * num_levels`` candidates reach NMS — a global
    top-k starves low-resolution levels in crowded scenes.

    ``scores``: (N, K) with N the concatenation of ``level_sizes`` rows.
    Returns a TopkResult whose first axis is sum(min(topk, size*K)) —
    static, ordered level-major. keep_idxs index the CONCATENATED rows."""
    parts = []
    start = 0
    for size in level_sizes:
        r = filter_scores_and_topk(scores[start:start + size], score_thr,
                                   min(topk, size * scores.shape[1]))
        parts.append(TopkResult(r.scores, r.labels,
                                r.keep_idxs + start, r.valid))
        start += size
    return TopkResult(*[jnp.concatenate([getattr(p, f) for p in parts])
                        for f in TopkResult._fields])


def matrix_nms(ious: jnp.ndarray, labels: jnp.ndarray,
               scores: jnp.ndarray, kernel: str = "gaussian",
               sigma: float = 2.0, valid=None) -> jnp.ndarray:
    """Matrix NMS score decay (mask_matrix_nms, core/post_processing/
    matrix_nms.py:5-121) under static shapes.

    Instead of suppressing, every instance's score decays by the min over
    higher-scored same-class instances of kernel(iou) / kernel(that
    instance's own max iou to anything above it) — one (N, N) matrix pass,
    no sequential loop: the TPU-friendly NMS.

    Args:
      ious: (N, N) symmetric IoU (box IoU or mask IoU — caller's choice;
        the reference computes mask IoU from flattened masks).
      labels: (N,) int; scores: (N,) float; valid: (N,) bool or None.
    Returns decayed scores (N,); invalid entries get 0. Entries must be
    pre-sorted by descending score (the reference sorts first) — the decay
    uses the upper triangle as "higher-scored".
    """
    n = scores.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    tri = jnp.triu(jnp.ones((n, n), bool), k=1)  # j strictly above i? no:
    # row i = higher-scored, col j = lower-scored (reference .triu(1))
    same = (labels[:, None] == labels[None, :]) & valid[:, None] & \
        valid[None, :]
    decay_iou = jnp.where(tri & same, ious, 0.0)          # (N, N)
    # compensation: each HIGHER-scored instance i's own max iou to anything
    # above it (matrix_nms.py:81-84 — compensate_iou.max(0).T puts the
    # per-instance value on the row axis)
    compensate = decay_iou.max(axis=0)                    # (N,)
    if kernel == "gaussian":
        decay = jnp.exp(-sigma * decay_iou ** 2) / jnp.exp(
            -sigma * compensate[:, None] ** 2)
    elif kernel == "linear":
        decay = (1 - decay_iou) / (1 - compensate[:, None])
    else:
        raise ValueError(f"unsupported kernel {kernel!r}")
    # min over rows, but only where a same-class higher-scored entry exists
    decay = jnp.where(tri & same, decay, jnp.inf)
    coeff = jnp.minimum(decay.min(axis=0), 1.0)
    return jnp.where(valid, scores * coeff, 0.0)


def box_matrix_nms(boxes: jnp.ndarray, labels: jnp.ndarray,
                   scores: jnp.ndarray, kernel: str = "gaussian",
                   sigma: float = 2.0, valid=None):
    """Matrix NMS over xyxy boxes: sorts by score, decays, returns
    (boxes, decayed_scores, labels, order) all score-sorted, static shape.
    Threshold the returned scores (the reference's filter_thr) caller-side.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    order = jnp.argsort(jnp.where(valid, -scores, jnp.inf))
    b, s, l, v = boxes[order], scores[order], labels[order], valid[order]
    x1, y1, x2, y2 = (b[:, i] for i in range(4))
    area = jnp.clip(x2 - x1, 0, None) * jnp.clip(y2 - y1, 0, None)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.clip(ix2 - ix1, 0, None) * jnp.clip(iy2 - iy1, 0, None)
    ious = inter / jnp.clip(area[:, None] + area[None, :] - inter,
                            1e-6, None)
    new_scores = matrix_nms(ious, l, s, kernel, sigma, v)
    return b, new_scores, l, order


def _pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(Na, 4) x (Nb, 4) -> (Na, Nb) IoU (boxes.bbox_overlaps)."""
    from .boxes import bbox_overlaps
    return bbox_overlaps(a, b)


def _nms_keep_scan(shifted: jnp.ndarray, svalid: jnp.ndarray,
                   iou_thr: float) -> jnp.ndarray:
    """Greedy keep mask over score-sorted boxes: one sequential pass,
    n loop iterations on the full (n, n) IoU matrix. The oracle
    formulation — tiled below computes the identical mask."""
    n = shifted.shape[0]
    iou = _pairwise_iou(shifted, shifted)

    def body(i, keep):
        sup = (iou[i] > iou_thr) & keep & (jnp.arange(n) > i)
        return jnp.where(keep[i], keep & ~sup, keep)

    return jax.lax.fori_loop(0, n, body, svalid)


def _nms_keep_tiled(shifted: jnp.ndarray, svalid: jnp.ndarray,
                    iou_thr: float, tile: int = 512) -> jnp.ndarray:
    """Exact greedy NMS keep mask in O(n/tile) sequential steps.

    The sequential scan's n loop iterations dominate large suppressions
    on TPU (each is a tiny vector op behind a loop boundary). This is
    the tf.image.non_max_suppression_padded decomposition: process
    score-sorted boxes in tiles; each tile is (a) suppressed by the
    already-finalized earlier tiles with one (tile, n) matrix pass, then
    (b) self-suppressed to the exact greedy fixpoint by iterating
      act <- base & ~any_k(sup[i, k] & act[k])   (k < i within the tile)
    under a while_loop. The iteration alternates around the greedy
    solution (f is antitone, f∘f monotone) and pins box i after at most
    depth(i) rounds, where depth is its longest alternating
    suppress/revive chain — typically 2-4, bounded by the tile size.
    Also avoids the scan's full (n, n) IoU: peak intermediate is
    (tile, n), which is what lets the 5k-candidate RPN/dense decodes
    fit alongside big feature maps.
    """
    n = shifted.shape[0]
    npad = -(-n // tile) * tile
    if npad != n:
        shifted = jnp.pad(shifted, ((0, npad - n), (0, 0)))
        svalid = jnp.pad(svalid, (0, npad - n))
    col = jnp.arange(npad)
    lower = jnp.arange(tile)[:, None] > jnp.arange(tile)[None, :]

    def tile_body(j, keep):
        start = j * tile
        rows = jax.lax.dynamic_slice(shifted, (start, 0), (tile, 4))
        iou_rows = _pairwise_iou(rows, shifted)            # (tile, npad)
        rvalid = jax.lax.dynamic_slice(svalid, (start,), (tile,))
        # (a) cross-suppression by finalized earlier-tile keeps
        cross = ((iou_rows > iou_thr) & (col[None, :] < start)
                 & keep[None, :])
        base = rvalid & ~cross.any(-1)
        # (b) intra-tile fixpoint to the greedy solution
        intra = jax.lax.dynamic_slice(iou_rows, (0, start), (tile, tile))
        sup = (intra > iou_thr) & lower

        def cond(c):
            act, prev, it = c
            return (it < tile) & jnp.any(act != prev)

        def body(c):
            act, _, it = c
            new = base & ~(sup & act[None, :]).any(-1)
            return new, act, it + 1

        act0 = base & ~(sup & base[None, :]).any(-1)
        act, _, _ = jax.lax.while_loop(cond, body, (act0, base, 0))
        return jax.lax.dynamic_update_slice(keep, act, (start,))

    keep = jax.lax.fori_loop(0, npad // tile, tile_body, svalid)
    return keep[:n]


def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray, labels: jnp.ndarray,
                iou_thr: float, max_out: int, valid=None):
    """Class-aware NMS with static output size (for the CNN-head families).

    Uses the class-offset trick: boxes of different classes are translated to
    disjoint regions so one class-agnostic pass suffices, then greedy
    suppression over score-sorted candidates — tiled-exact for big
    candidate sets (``_nms_keep_tiled``), plain scan for small ones
    (env opt-out DSKD_NMS_TILED=0 forces the scan everywhere).

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

    if n > 768 and os.environ.get("DSKD_NMS_TILED", "1") == "1":
        keep = _nms_keep_tiled(shifted, svalid, iou_thr,
                               tile=int(os.environ.get("DSKD_NMS_TILE",
                                                       "512")))
    else:
        keep = _nms_keep_scan(shifted, svalid, iou_thr)
    # compact the kept entries to the front deterministically
    rank = jnp.argsort(jnp.where(keep, -sscores, jnp.inf))[:max_out]
    out_keep = keep[rank]
    src_idx = order[rank]  # original row of each output slot
    return (sboxes[rank], jnp.where(out_keep, sscores[rank], 0.0),
            slabels[rank], out_keep, src_idx)


def nms_match_groups(boxes: jnp.ndarray, scores: jnp.ndarray,
                     valid: jnp.ndarray, iou_thr: float = 0.5):
    """mmcv ``nms_match`` as group labels (parity: the grouping NMS used
    by ScoreHLRSampler, score_hlr_sampler.py:178 — every box joins the
    group of the highest-scoring box that would have suppressed it).

    Returns (N,) int32: for each valid box the ROW INDEX of its group
    keeper (keepers point at themselves); invalid rows get -1. Static
    shapes via a bounded ``lax.while_loop`` (one iteration per group,
    at most N).
    """
    from .boxes import bbox_overlaps

    N = boxes.shape[0]
    ious = bbox_overlaps(boxes, boxes)

    def cond(state):
        group, _ = state
        return ((group < 0) & valid).any()

    def body(state):
        group, _ = state
        unassigned = (group < 0) & valid
        keeper = jnp.argmax(jnp.where(unassigned, scores, -jnp.inf))
        join = unassigned & (ious[keeper] >= iou_thr)
        join = join | (jnp.arange(N) == keeper)
        group = jnp.where(join & unassigned, keeper, group)
        return group, 0

    group0 = jnp.full((N,), -1, jnp.int32)
    group, _ = jax.lax.while_loop(cond, body, (group0, 0))
    return group


def soft_nms(boxes: jnp.ndarray, scores: jnp.ndarray, labels: jnp.ndarray,
             max_out: int, valid=None, sigma: float = 0.5,
             min_score: float = 1e-3):
    """Greedy Gaussian Soft-NMS under static shapes (Bodla et al.; the
    mmcv ops.soft_nms method='gaussian' the corner families' test_cfg
    requests — configs/cornernet + centripetalnet nms=soft_nms gaussian).

    Sequentially selects the current-highest-score box; every remaining
    SAME-CLASS box decays by exp(-iou^2 / sigma) (the gaussian method
    decays unconditionally — iou_threshold only gates the linear method).
    Each selection keeps its decayed-at-selection score; selections at or
    below ``min_score`` are marked invalid.

    Returns (boxes, scores, labels, keep_mask) with first axis max_out,
    ordered by selection (descending decayed score).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    area = jnp.clip(x2 - x1, 0, None) * jnp.clip(y2 - y1, 0, None)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.clip(ix2 - ix1, 0, None) * jnp.clip(iy2 - iy1, 0, None)
    union = jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)
    iou = jnp.where(labels[:, None] == labels[None, :], inter / union, 0.0)

    s0 = jnp.where(valid, scores, -jnp.inf)

    def body(i, carry):
        s, out_idx, out_sc = carry
        j = jnp.argmax(s)
        sj = s[j]
        s = s * jnp.exp(-(iou[j] ** 2) / sigma)
        s = s.at[j].set(-jnp.inf)
        return (s, out_idx.at[i].set(j.astype(jnp.int32)),
                out_sc.at[i].set(sj))

    _, idxs, sc = jax.lax.fori_loop(
        0, max_out, body,
        (s0, jnp.zeros((max_out,), jnp.int32),
         jnp.full((max_out,), -jnp.inf, scores.dtype)))
    keep = sc > min_score
    return (boxes[idxs], jnp.where(keep, sc, 0.0), labels[idxs], keep)


def fast_nms(boxes, scores, score_thr: float, iou_thr: float,
             top_k: int, max_out: int, coeffs=None, valid=None):
    """YOLACT Fast NMS (core/post_processing/bbox_nms.py:98-170) under
    static shapes: per class, keep the top_k by score, suppress any
    detection whose IoU to a HIGHER-scored same-class detection exceeds
    ``iou_thr`` — already-suppressed detections still suppress (the
    paper's parallel relaxation) — then keep the global top ``max_out``.

    boxes (N, 4), scores (N, C), coeffs optional (N, K). Returns
    (boxes (max_out, 4), scores, labels, coeffs | None, keep_mask)."""
    N, C = scores.shape
    k = min(top_k, N)
    s = scores
    if valid is not None:
        s = jnp.where(valid[:, None], s, -1.0)
    sc, idx = jax.lax.top_k(s.T, k)                   # (C, k)
    b = boxes[idx]                                    # (C, k, 4)
    x1 = jnp.maximum(b[:, :, None, 0], b[:, None, :, 0])
    y1 = jnp.maximum(b[:, :, None, 1], b[:, None, :, 1])
    x2 = jnp.minimum(b[:, :, None, 2], b[:, None, :, 2])
    y2 = jnp.minimum(b[:, :, None, 3], b[:, None, :, 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    area = jnp.clip(b[..., 2] - b[..., 0], 0) \
        * jnp.clip(b[..., 3] - b[..., 1], 0)
    union = jnp.maximum(area[:, :, None] + area[:, None, :] - inter, 1e-9)
    iou = inter / union                               # (C, k, k)
    # triu(diagonal=1): row j suppresses column i only for j < i
    tri = jnp.tril(jnp.ones((k, k), bool))            # j >= i zeroed below
    iou = jnp.where(tri[None], 0.0, iou)
    iou_max = iou.max(axis=1)                         # (C, k) over j < i
    keep = (iou_max <= iou_thr) & (sc > score_thr)

    flat_sc = jnp.where(keep, sc, -1.0).reshape(-1)   # (C*k,)
    m = min(max_out, C * k)
    out_sc, oi = jax.lax.top_k(flat_sc, m)
    cls = (oi // k).astype(jnp.int32)
    det = idx.reshape(-1)[oi]                         # original row ids
    out_b = boxes[det]
    out_c = coeffs[det] if coeffs is not None else None
    ok = out_sc > 0.0
    if m < max_out:
        pad = max_out - m
        out_b = jnp.pad(out_b, ((0, pad), (0, 0)))
        out_sc = jnp.pad(out_sc, (0, pad), constant_values=-1.0)
        cls = jnp.pad(cls, (0, pad))
        ok = jnp.pad(ok, (0, pad))
        if out_c is not None:
            out_c = jnp.pad(out_c, ((0, pad), (0, 0)))
    return out_b, out_sc, cls, out_c, ok

"""Device-side (jittable) Hungarian matching + GFL-DETR cost stack.

Replaces the reference's per-image scipy ``linear_sum_assignment`` host
round-trip (mmdet/core/bbox/assigners/gfl_hungarian_assigner.py:142-151)
with a batched Jonker-Volgenant shortest-augmenting-path LAP solver that
runs entirely on device under ``vmap``/``jit``.

Padding discipline: ground-truth rows are padded to a static ``max_gt``;
padded rows are given a constant cost (0 over all columns), which provably
does not disturb the optimal assignment of the real rows (a constant row is
indifferent between remaining columns). The caller masks padded rows out of
the result.

Cost parity targets (studied from the reference):
  * QualityFocalLossCost (match_cost.py:152-270): BCE-with-logits of the
    predicted logit at the GT class against the pred-GT IoU, modulated by
    |IoU - sigmoid|^beta. No negative term.
  * BBoxL1Cost (match_cost.py:11-52, box_format='xywh'): L1 cdist between
    predicted cxcywh and GT cxcywh (both normalized).
  * IoUCost: -GIoU(pred_xyxy*factor, gt_xyxy).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .boxes import bbox_cxcywh_to_xyxy, bbox_overlaps, bbox_xyxy_to_cxcywh
from .losses import binary_cross_entropy_with_logits

_INF = 1e9


def lap_jv(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve the rectangular linear assignment problem exactly.

    Args:
      cost: (R, C) float cost matrix with R <= C. Every row is assigned to a
        distinct column minimizing total cost (Jonker-Volgenant / e-maxx
        potentials formulation; exact, same optima as scipy).

    Returns:
      (R,) int32 column index assigned to each row.
    """
    R, C = cost.shape
    assert R <= C, (R, C)
    cost1 = jnp.pad(cost.astype(jnp.float32), ((1, 0), (1, 0)))  # 1-indexed

    u0 = jnp.zeros(R + 1, jnp.float32)
    v0 = jnp.zeros(C + 1, jnp.float32)
    p0 = jnp.zeros(C + 1, jnp.int32)  # p[j]: row matched to column j (0=free)
    col_range = jnp.arange(C + 1)

    def insert_row(i, carry):
        u, v, p = carry
        p = p.at[0].set(i)
        minv = jnp.full(C + 1, _INF, jnp.float32)
        used = jnp.zeros(C + 1, bool)
        way = jnp.zeros(C + 1, jnp.int32)

        def cond(state):
            _, _, p, _, _, _, j0 = state
            return p[j0] != 0

        def body(state):
            u, v, p, minv, used, way, j0 = state
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = cost1[i0] - u[i0] - v
            scan_mask = (~used) & (col_range >= 1)
            better = scan_mask & (cur < minv)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(scan_mask, minv, _INF)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            u = u.at[p].add(jnp.where(used, delta, 0.0))
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return u, v, p, minv, used, way, j1

        u, v, p, minv, used, way, j0 = lax.while_loop(
            cond, body, (u, v, p, minv, used, way, jnp.int32(0)))

        def aug_cond(state):
            _, j0 = state
            return j0 != 0

        def aug_body(state):
            p, j0 = state
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return p, j1

        p, _ = lax.while_loop(aug_cond, aug_body, (p, j0))
        return u, v, p

    _, _, p = lax.fori_loop(1, R + 1, insert_row, (u0, v0, p0))

    # invert: column j (1..C) holds row p[j]; build row -> col
    pj = p[1:]                       # (C,) row ids (1-based, 0 = free)
    rows = jnp.where(pj > 0, pj - 1, R)  # R is out-of-bounds -> dropped
    row2col = jnp.full((R,), -1, jnp.int32).at[rows].set(
        jnp.arange(C, dtype=jnp.int32), mode="drop")
    return row2col


def lap_auction(cost: jnp.ndarray, eps_frac: float = None,
                max_iters: int = 1500,
                with_stats: bool = False,
                row_mask: jnp.ndarray = None) -> jnp.ndarray:
    """Near-optimal LAP via the auction algorithm (Bertsekas), batched-
    friendly: every iteration is a handful of vectorized (R, C) ops, so the
    degenerate early-training costs that drive the sequential JV solver to
    O(R^2) augmenting chains (~500 ms/step, PERF.md) finish in ~R rounds.

    Single phase with eps = span * eps_frac: solution within R*eps of the
    optimum (ties among near-equal costs may resolve differently than scipy,
    immaterial for matcher use). Rectangular eps-scaling with price reuse is
    intentionally NOT used — inflated prices on finally-unmatched columns
    break rectangular duality and give genuinely suboptimal matchings.
    If max_iters hits (pathological fully-contested costs), the remaining
    rows take arbitrary distinct free columns so the result is always a
    valid one-to-one assignment.

    Returns (R,) column assigned to each row (R <= C); with ``with_stats``
    also returns the number of rows the completion fallback placed (0 when
    the auction converged — nonzero means the matching quality degraded
    and should be surfaced in the training log).

    ``row_mask``: optional (R,) bool — rows marked False never bid and the
    loop terminates once every True row is assigned. Use for PADDED rows
    (their assignments are discarded by the caller anyway): without the
    mask, K padding rows with identical constant costs all prefer the same
    column and the auction resolves exactly one of them per round — K extra
    sequential iterations for matches nobody reads. Masked rows get
    distinct leftover columns from the completion fallback, so the result
    is still a valid one-to-one assignment, and they are excluded from the
    fallback statistic.
    """
    if eps_frac is None:
        # default 1/100 (measured: loss trajectories match JV, PERF.md);
        # DSKD_AUCTION_EPS sweeps the DEFAULT only — an explicit caller
        # eps_frac always wins (trace-time env reads must not shadow args)
        import os
        env_eps = os.environ.get("DSKD_AUCTION_EPS")  # value = 1/eps_frac
        eps_frac = 1.0 / float(env_eps) if env_eps is not None else 1 / 100
    R, C = cost.shape
    assert R <= C, (R, C)
    v = -cost.astype(jnp.float32)
    span = jnp.maximum(v.max() - v.min(), 1e-6)
    eps = span * eps_frac
    rows = jnp.arange(R, dtype=jnp.int32)
    cols = jnp.arange(C, dtype=jnp.int32)

    live = jnp.ones((R,), bool) if row_mask is None else row_mask

    def cond(s):
        _, rowcol, _, it = s
        return ((rowcol < 0) & live).any() & (it < max_iters)

    def body(s):
        owner, rowcol, prices, it = s
        val = v - prices[None, :]
        # top-2 via two max passes: lax.top_k lowers to a sort-based
        # kernel on TPU, while argmax + masked max are plain VPU
        # reductions. Tie semantics match top_k (first index wins; an
        # equal runner-up gives the same zero margin).
        best_col = jnp.argmax(val, axis=-1).astype(jnp.int32)
        m1 = jnp.take_along_axis(val, best_col[:, None], axis=-1)[:, 0]
        m2 = jnp.where(cols[None, :] == best_col[:, None],
                       -jnp.inf, val).max(-1)
        bid = prices[best_col] + (m1 - m2) + eps
        active = (rowcol < 0) & live
        tgt = jnp.where(active, best_col, C)
        best_bid = jnp.full((C + 1,), -jnp.inf).at[tgt].max(
            jnp.where(active, bid, -jnp.inf))
        is_best = active & (bid >= best_bid[jnp.clip(tgt, 0, C)])
        win_row = jnp.full((C + 1,), R, jnp.int32).at[
            jnp.where(is_best, tgt, C)].min(rows)
        w = win_row[:C]
        has_winner = w < R
        # previous owners of re-auctioned columns lose their match
        prev = jnp.where(has_winner, owner, -1)
        lost = jnp.zeros((R + 1,), bool).at[
            jnp.where(prev >= 0, prev, R)].set(True, mode="drop")[:R]
        rowcol = jnp.where(lost, -1, rowcol)
        owner = jnp.where(has_winner, w, owner)
        rowcol = rowcol.at[jnp.where(has_winner, w, R)].set(
            cols, mode="drop")
        prices = jnp.where(has_winner, best_bid[:C], prices)
        return owner, rowcol, prices, it + 1

    owner0 = jnp.full((C,), -1, jnp.int32)
    rowcol0 = jnp.full((R,), -1, jnp.int32)
    owner, rowcol, _, _ = lax.while_loop(
        cond, body, (owner0, rowcol0, jnp.zeros((C,), jnp.float32),
                     jnp.int32(0)))

    # completion fallback: pair leftover unassigned rows with free columns
    # by rank (k-th unassigned row <- k-th free column)
    unassigned = rowcol < 0
    free = owner < 0
    row_rank = jnp.cumsum(unassigned) - 1              # (R,)
    free_cols = jnp.nonzero(free, size=C, fill_value=C - 1)[0].astype(
        jnp.int32)
    fallback = free_cols[jnp.clip(row_rank, 0, C - 1)]
    result = jnp.where(unassigned, fallback, rowcol)
    if with_stats:
        return result, (unassigned & live).sum().astype(jnp.int32)
    return result


def _tie_jitter(shape) -> jnp.ndarray:
    """Deterministic per-cell U[0,1) tie-break noise.

    Uses a Knuth/xxhash-style multiplicative mix so each row's preference
    ORDER over columns is decorrelated across rows. The previous linear
    hash ((r*131071 + c*8191) % 65521) never wraps within c < 300 for
    small r, so EVERY row's jitter was minimized at c=0 — under the
    auction solver, rows with tied costs then all contend for column 0
    and resolve one per round instead of spreading across free columns.
    """
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    h = (r * jnp.uint32(2654435761) + c) * jnp.uint32(2246822519)
    h = (h ^ (h >> 15)) * jnp.uint32(2654435761)
    return (h >> 8).astype(jnp.float32) / jnp.float32(1 << 24)


class AssignResult(NamedTuple):
    """Static-shape assignment for one image.

    assigned_gt: (Q,) int32, index of matched GT in [0, max_gt) or -1.
    assigned_labels: (Q,) int32, matched GT label or -1.
    pos_mask: (Q,) bool, query is matched to a *valid* GT.
    num_pos: () int32, number of valid GT matched (== num valid GT).
    """
    assigned_gt: jnp.ndarray
    assigned_labels: jnp.ndarray
    pos_mask: jnp.ndarray
    num_pos: jnp.ndarray
    # rows placed by the auction solver's completion fallback (0 for JV /
    # converged auctions) — surfaced in the training log as a quality
    # tripwire for the approximate matcher
    num_fallback: jnp.ndarray = jnp.int32(0)


def gfl_match_cost(cls_logits: jnp.ndarray,
                   bbox_cxcywh: jnp.ndarray,
                   gt_bboxes: jnp.ndarray,
                   gt_labels: jnp.ndarray,
                   img_hw: jnp.ndarray,
                   cls_weight: float = 2.0,
                   reg_weight: float = 5.0,
                   iou_weight: float = 2.0,
                   beta: float = 2.0) -> jnp.ndarray:
    """(Q, G) weighted matching cost for the GFL-DETR head.

    gt_bboxes are unnormalized xyxy in input-image coordinates; img_hw is the
    per-image valid (h, w) used to normalize (reference uses img_shape).
    """
    h, w = img_hw[0].astype(cls_logits.dtype), img_hw[1].astype(cls_logits.dtype)
    factor = jnp.stack([w, h, w, h])
    gt_norm = gt_bboxes / factor
    gt_cxcywh = bbox_xyxy_to_cxcywh(gt_norm)

    # L1 cost on normalized cxcywh
    reg_cost = jnp.abs(bbox_cxcywh[:, None, :] - gt_cxcywh[None, :, :]).sum(-1)

    pred_xyxy = bbox_cxcywh_to_xyxy(bbox_cxcywh)
    iou_cost = -bbox_overlaps(pred_xyxy * factor, gt_bboxes, mode="giou")

    # QFL cost: logit at GT class vs pred-GT IoU (normalized coords)
    score = bbox_overlaps(pred_xyxy, gt_norm)                    # (Q, G)
    safe_labels = jnp.clip(gt_labels, 0, cls_logits.shape[-1] - 1)
    logit_at = cls_logits[:, safe_labels]                        # (Q, G)
    sig_at = jax.nn.sigmoid(logit_at)
    cls_cost = binary_cross_entropy_with_logits(logit_at, score) * jnp.abs(
        score - sig_at) ** beta

    return (cls_weight * cls_cost + reg_weight * reg_cost
            + iou_weight * iou_cost)


def hungarian_assign(cost: jnp.ndarray, gt_valid: jnp.ndarray,
                     gt_labels: jnp.ndarray,
                     tiebreak: float = 1e-6,
                     solver: str = "jv") -> AssignResult:
    """One-to-one assign queries <- GT from a (Q, G) cost with validity mask.

    Padded (invalid) GT rows are replaced with constant-0 rows before the
    solve, preserving the optimum over valid rows; they are then masked out.

    ``tiebreak`` adds a deterministic per-cell jitter of that relative
    magnitude: untrained networks produce near-identical costs, and exact
    ties make the augmenting-path search relabel O(C) columns per row
    (~500 ms/step on a v5e); the jitter collapses ties (any matching among
    equal costs is equally optimal) and keeps the solve sub-millisecond.
    """
    Q, G = cost.shape
    if G > Q:
        # more (merged) GT slots than queries: solve with queries as rows —
        # min(Q, G) pairs get matched, exactly scipy's rectangular behavior
        # (extra GT stay unassigned). Invalid GT columns carry a big-M cost
        # so they are only taken once the valid ones are exhausted.
        big_m = 1e6
        cost_rows = jnp.where(gt_valid[None, :], cost, big_m)    # (Q, G)
        if tiebreak:
            span = jnp.maximum(cost_rows.max() - cost_rows.min(), 1e-3)
            cost_rows = cost_rows + span * tiebreak * _tie_jitter((Q, G))
        if solver == "auction":
            q2g, n_fb = lap_auction(cost_rows, with_stats=True)
        else:
            q2g, n_fb = lap_jv(cost_rows), jnp.int32(0)          # (Q,)
        hit_valid = gt_valid[q2g]
        assigned_gt = jnp.where(hit_valid, q2g.astype(jnp.int32), -1)
        assigned_labels = jnp.where(
            hit_valid, gt_labels[q2g].astype(jnp.int32), -1)
        pos_mask = assigned_gt >= 0
        num_pos = pos_mask.sum().astype(jnp.int32)
        return AssignResult(assigned_gt, assigned_labels, pos_mask, num_pos,
                            n_fb)

    cost_rows = jnp.where(gt_valid[:, None], cost.T, 0.0)        # (G, Q)
    if tiebreak:
        span = jnp.maximum(cost_rows.max() - cost_rows.min(), 1e-3)
        cost_rows = cost_rows + span * tiebreak * _tie_jitter((G, Q))
    if solver == "auction":
        # padded GT rows never bid (their matches are discarded below);
        # without the mask each padding row costs one sequential auction
        # round — ~100 extra iterations/solve at teacher_max_per_img=100
        row2col, n_fb = lap_auction(cost_rows, with_stats=True,
                                    row_mask=gt_valid)           # (G,)
    else:
        row2col, n_fb = lap_jv(cost_rows), jnp.int32(0)

    assigned_gt = jnp.full((Q,), -1, jnp.int32)
    assigned_labels = jnp.full((Q,), -1, jnp.int32)
    cols = jnp.where(gt_valid, row2col, Q)                       # Q = OOB drop
    assigned_gt = assigned_gt.at[cols].set(
        jnp.arange(G, dtype=jnp.int32), mode="drop")
    assigned_labels = assigned_labels.at[cols].set(
        gt_labels.astype(jnp.int32), mode="drop")
    pos_mask = assigned_gt >= 0
    num_pos = gt_valid.sum().astype(jnp.int32)
    return AssignResult(assigned_gt, assigned_labels, pos_mask, num_pos,
                        n_fb)


@partial(jax.jit, static_argnames=())
def gfl_hungarian_assign(cls_logits, bbox_cxcywh, gt_bboxes, gt_labels,
                         gt_valid, img_hw) -> AssignResult:
    """Full GFL Hungarian assignment for one image (jit/vmap friendly)."""
    cost = gfl_match_cost(cls_logits, bbox_cxcywh, gt_bboxes, gt_labels,
                          img_hw)
    return hungarian_assign(cost, gt_valid, gt_labels)


def focal_loss_cost(cls_logits, gt_labels, weight=1.0, alpha=0.25,
                    gamma=2.0, eps=1e-12):
    """FocalLossCost (match_cost.py:56-113): pos - neg focal terms at the
    GT classes."""
    p = jax.nn.sigmoid(cls_logits)
    neg = -jnp.log(1 - p + eps) * (1 - alpha) * p ** gamma
    pos = -jnp.log(p + eps) * alpha * (1 - p) ** gamma
    safe = jnp.clip(gt_labels, 0, cls_logits.shape[-1] - 1)
    return (pos[:, safe] - neg[:, safe]) * weight


def classification_cost(cls_logits, gt_labels, weight=1.0):
    """ClassificationCost: -softmax prob at the GT class."""
    probs = jax.nn.softmax(cls_logits, axis=-1)
    safe = jnp.clip(gt_labels, 0, cls_logits.shape[-1] - 1)
    return -probs[:, safe] * weight


def detr_match_cost(cls_logits, bbox_cxcywh, gt_bboxes, gt_labels, img_hw,
                    cls_cost: str = "focal", cls_weight: float = 2.0,
                    reg_weight: float = 5.0, iou_weight: float = 2.0):
    """Standard DETR HungarianAssigner cost stack (hungarian_assigner.py):
    Focal/Classification cls cost + normalized-cxcywh L1 + GIoU."""
    h = img_hw[0].astype(cls_logits.dtype)
    w = img_hw[1].astype(cls_logits.dtype)
    factor = jnp.stack([w, h, w, h])
    gt_norm = gt_bboxes / factor
    gt_cxcywh = bbox_xyxy_to_cxcywh(gt_norm)
    reg = jnp.abs(bbox_cxcywh[:, None] - gt_cxcywh[None]).sum(-1)
    pred_xyxy = bbox_cxcywh_to_xyxy(bbox_cxcywh)
    iou = -bbox_overlaps(pred_xyxy * factor, gt_bboxes, mode="giou")
    if cls_cost == "focal":
        cls = focal_loss_cost(cls_logits, gt_labels)
    else:
        cls = classification_cost(cls_logits, gt_labels)
    return cls_weight * cls + reg_weight * reg + iou_weight * iou


def distill_hungarian_assign(cls_logits, bbox_cxcywh, teacher_bboxes,
                             teacher_labels, teacher_valid,
                             img_hw) -> AssignResult:
    """DistillHungarianAssigner (distill_hungarian_assigner.py): one-to-one
    matching of student predictions to TEACHER predictions for response
    distillation — ClassificationCost + L1 + GIoU, all weight 1."""
    cost = detr_match_cost(cls_logits, bbox_cxcywh, teacher_bboxes,
                           teacher_labels, img_hw, cls_cost="softmax",
                           cls_weight=1.0, reg_weight=1.0, iou_weight=1.0)
    return hungarian_assign(cost, teacher_valid, teacher_labels)


def distribution_focal_loss_cost(pred_corner: jnp.ndarray,
                                 target_corner: jnp.ndarray,
                                 weight: float = 1.0) -> jnp.ndarray:
    """DistributionFocalLossCost (match_cost.py:277-350).

    pred_corner: (Q*4, reg_max+1) distribution logits (4 corners per query);
    target_corner: (G*4,) continuous bin targets. Returns (Q, G) cost =
    per-pair DFL averaged over the 4 matched corners, scaled by 1/(G*4) —
    the reference's normalization quirk (:347) is preserved.

    NOTE: the reference's own implementation is dead code with a broken
    reshape ((Q*4*G*4,) -> (Q, G, 4) cannot hold; verified to raise) —
    no config uses it. The intended semantics (pair corner c of the query
    with corner c of the GT, average over c) are implemented here.
    """
    n_bins = pred_corner.shape[-1]
    Q = pred_corner.shape[0] // 4
    G = target_corner.shape[0] // 4

    logp = jax.nn.log_softmax(pred_corner, axis=-1)      # (Q*4, n)
    t = target_corner
    dis_left = jnp.clip(t.astype(jnp.int32), 0, n_bins - 1)
    dis_right = jnp.clip(dis_left + 1, 0, n_bins - 1)
    w_left = (dis_left + 1).astype(logp.dtype) - t
    w_right = t - dis_left.astype(logp.dtype)

    # (Q*4, G*4) cross CE at the two bracketing bins
    ce_l = -logp[:, dis_left]
    ce_r = -logp[:, dis_right]
    loss = ce_l * w_left[None, :] + ce_r * w_right[None, :]
    # pair corner c of query q with corner c of gt g (the reference repeats
    # flat (Q*4) x (G*4) then reshapes (Q, G, 4) -> pairs index (q*4+c,
    # g*4+c) ... its reshape actually averages the (c_pred, c_gt) diagonal
    # blocks; replicate by gathering the matched-corner diagonal)
    loss = loss.reshape(Q, 4, G, 4)
    diag = jnp.einsum("qcgc->qcg", loss)                  # matched corners
    cost = diag.mean(axis=1) / (G * 4)
    return cost * weight

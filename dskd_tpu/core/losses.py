"""Detection / distillation loss library with the weight+avg_factor protocol.

Every loss here is a pure function ``loss(pred, target, weight=None,
reduction='mean', avg_factor=None)`` replicating the reduction semantics of
the reference's ``weighted_loss`` decorator (mmdet/models/losses/utils.py):

  * elementwise loss is multiplied by ``weight`` when given;
  * no ``avg_factor``: reduce by ``reduction`` ('none' | 'mean' | 'sum');
  * with ``avg_factor`` and reduction='mean': ``loss.sum() / (avg_factor+eps)``;
  * with ``avg_factor`` and reduction='sum': error (matches reference).

Loss formula parity targets:
  * QualityFocalLoss / DistributionFocalLoss: mmdet/models/losses/gfocal_loss.py
  * GIoULoss: mmdet/models/losses/iou_loss.py
  * L1/SmoothL1: mmdet/models/losses/smooth_l1_loss.py
  * KnowledgeDistillationKLDivLoss: mmdet/models/losses/kd_loss.py
  * MSELoss: mmdet/models/losses/mse_loss.py

All losses are mask-friendly: padded entries are neutralized via ``weight=0``
so shapes stay static under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps

_F32_EPS = float(jnp.finfo(jnp.float32).eps)


def weight_reduce_loss(loss, weight=None, reduction="mean", avg_factor=None):
    """Apply elementwise weight then reduce, following the reference protocol."""
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        if reduction == "none":
            return loss
        if reduction == "mean":
            return loss.mean()
        if reduction == "sum":
            return loss.sum()
        raise ValueError(reduction)
    if reduction == "mean":
        return loss.sum() / (avg_factor + _F32_EPS)
    if reduction == "none":
        return loss
    raise ValueError('avg_factor can not be used with reduction="sum"')


def _weighted(elem_fn):
    def wrapper(pred, target, weight=None, reduction="mean", avg_factor=None,
                **kwargs):
        loss = elem_fn(pred, target, **kwargs)
        return weight_reduce_loss(loss, weight, reduction, avg_factor)
    return wrapper


# ---------------------------------------------------------------------------
# elementwise cores
# ---------------------------------------------------------------------------

def binary_cross_entropy_with_logits(pred, target):
    """Numerically-stable elementwise BCE on logits."""
    # max(x,0) - x*t + log(1+exp(-|x|))
    return jnp.clip(pred, 0, None) - pred * target + jnp.log1p(
        jnp.exp(-jnp.abs(pred)))


@_weighted
def l1_loss(pred, target):
    return jnp.abs(pred - target)


@_weighted
def smooth_l1_loss(pred, target, beta: float = 1.0):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


@_weighted
def mse_loss(pred, target):
    return (pred - target) ** 2


@_weighted
def giou_loss(pred, target, eps: float = 1e-7):
    """1 - GIoU over aligned xyxy boxes; elementwise shape (..., )."""
    gious = bbox_overlaps(pred, target, mode="giou", is_aligned=True, eps=eps)
    return 1.0 - gious


@_weighted
def iou_loss(pred, target, eps: float = 1e-6, linear: bool = True):
    ious = jnp.clip(
        bbox_overlaps(pred, target, mode="iou", is_aligned=True, eps=eps),
        eps, None)
    return 1 - ious if linear else -jnp.log(ious)


@_weighted
def square_iou_loss(pred, target, eps: float = 1e-16):
    """IoULoss(mode='square'): 1 - IoU**2 (YOLOX's bbox loss,
    mmdet losses/iou_loss.py mode branch)."""
    ious = bbox_overlaps(pred, target, mode="iou", is_aligned=True, eps=eps)
    return 1.0 - jnp.square(ious)


@_weighted
def diou_loss(pred, target, eps: float = 1e-7):
    """Distance-IoU loss: 1 - IoU + center_dist^2 / diag^2 (iou_loss.py)."""
    ious = bbox_overlaps(pred, target, mode="iou", is_aligned=True, eps=eps)
    enclose_lt = jnp.minimum(pred[..., :2], target[..., :2])
    enclose_rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    cw = jnp.clip(enclose_rb[..., 0] - enclose_lt[..., 0], 0, None)
    ch = jnp.clip(enclose_rb[..., 1] - enclose_lt[..., 1], 0, None)
    c2 = cw ** 2 + ch ** 2 + eps
    px = (pred[..., 0] + pred[..., 2]) / 2
    py = (pred[..., 1] + pred[..., 3]) / 2
    tx = (target[..., 0] + target[..., 2]) / 2
    ty = (target[..., 1] + target[..., 3]) / 2
    rho2 = (px - tx) ** 2 + (py - ty) ** 2
    return 1 - ious + rho2 / c2


@_weighted
def ciou_loss(pred, target, eps: float = 1e-7):
    """Complete-IoU: DIoU + aspect-ratio consistency term."""
    import math as _math
    ious = bbox_overlaps(pred, target, mode="iou", is_aligned=True, eps=eps)
    enclose_lt = jnp.minimum(pred[..., :2], target[..., :2])
    enclose_rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    cw = jnp.clip(enclose_rb[..., 0] - enclose_lt[..., 0], 0, None)
    ch = jnp.clip(enclose_rb[..., 1] - enclose_lt[..., 1], 0, None)
    c2 = cw ** 2 + ch ** 2 + eps
    px = (pred[..., 0] + pred[..., 2]) / 2
    py = (pred[..., 1] + pred[..., 3]) / 2
    tx = (target[..., 0] + target[..., 2]) / 2
    ty = (target[..., 1] + target[..., 3]) / 2
    rho2 = (px - tx) ** 2 + (py - ty) ** 2
    w1 = pred[..., 2] - pred[..., 0] + eps
    h1 = pred[..., 3] - pred[..., 1] + eps
    w2 = target[..., 2] - target[..., 0] + eps
    h2 = target[..., 3] - target[..., 1] + eps
    factor = 4 / _math.pi ** 2
    v = factor * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = jax.lax.stop_gradient(v / (1 - ious + v + eps))
    return 1 - ious + rho2 / c2 + alpha * v


@_weighted
def quality_focal_loss(pred, target, beta: float = 2.0):
    """QFL on logits; target is (labels, score) with bg label == num_classes.

    pred: (N, C) logits. labels: (N,) int in [0, C] (C == background).
    score: (N,) IoU quality in [0, 1] for positives (0 elsewhere).
    Returns per-sample loss of shape (N,) (summed over classes).
    """
    label, score = target
    num_classes = pred.shape[-1]
    pred_sigmoid = jax.nn.sigmoid(pred)

    # negatives: supervised by 0 quality, modulated by sigmoid^beta
    neg = binary_cross_entropy_with_logits(pred, jnp.zeros_like(pred))
    loss = neg * pred_sigmoid ** beta

    # positives: at their class channel, supervised by IoU score
    is_pos = (label >= 0) & (label < num_classes)
    safe_label = jnp.clip(label, 0, num_classes - 1)
    onehot = jax.nn.one_hot(safe_label, num_classes, dtype=pred.dtype)
    pred_at = jnp.sum(pred * onehot, axis=-1)
    sig_at = jnp.sum(pred_sigmoid * onehot, axis=-1)
    pos_elem = binary_cross_entropy_with_logits(pred_at, score) * jnp.abs(
        score - sig_at) ** beta
    # scatter: replace the class channel for positive rows
    neg_at = jnp.sum(loss * onehot, axis=-1)
    loss_rows = loss.sum(axis=-1)
    loss_rows = jnp.where(is_pos, loss_rows - neg_at + pos_elem, loss_rows)
    return loss_rows


@_weighted
def distribution_focal_loss(pred, label):
    """DFL: CE to the two integer bins bracketing a continuous target.

    pred: (N, n+1) distribution logits (pre-softmax in the canonical GFL;
    the flagship head feeds sigmoid outputs here — semantics follow caller).
    label: (N,) continuous target in bin units.
    """
    dis_left = label.astype(jnp.int32)
    dis_right = dis_left + 1
    weight_left = dis_right.astype(pred.dtype) - label
    weight_right = label - dis_left.astype(pred.dtype)
    logp = jax.nn.log_softmax(pred, axis=-1)
    n_bins = pred.shape[-1]
    ce_left = -jnp.take_along_axis(
        logp, jnp.clip(dis_left, 0, n_bins - 1)[..., None], axis=-1)[..., 0]
    ce_right = -jnp.take_along_axis(
        logp, jnp.clip(dis_right, 0, n_bins - 1)[..., None], axis=-1)[..., 0]
    return ce_left * weight_left + ce_right * weight_right


@_weighted
def kd_kl_div_loss(pred, soft_label, T: float = 10.0, detach_target=True):
    """KL(softmax(t/T) || softmax(s/T)) * T^2, mean over the class axis.

    Matches F.kl_div(log_softmax(pred/T), softmax(t/T)).mean(-1) * T*T:
    elementwise target * (log(target) - logp), with 0*log(0) := 0.
    """
    target = jax.nn.softmax(soft_label / T, axis=-1)
    if detach_target:
        target = jax.lax.stop_gradient(target)
    logp = jax.nn.log_softmax(pred / T, axis=-1)
    log_t = jnp.where(target > 0, jnp.log(jnp.clip(target, _F32_EPS, None)),
                      jnp.zeros_like(target))
    kl = target * (log_t - logp)
    return kl.mean(axis=-1) * (T * T)


@_weighted
def sigmoid_focal_loss(pred, target, gamma: float = 2.0, alpha: float = 0.25):
    """Standard sigmoid focal loss; target is one-hot (N, C) or same-shape."""
    p = jax.nn.sigmoid(pred)
    ce = binary_cross_entropy_with_logits(pred, target)
    p_t = p * target + (1 - p) * (1 - target)
    alpha_t = alpha * target + (1 - alpha) * (1 - target)
    return alpha_t * (1 - p_t) ** gamma * ce


@_weighted
def gaussian_focal_loss(pred, gaussian_target, alpha: float = 2.0,
                        gamma: float = 4.0):
    """CornerNet/CenterNet heatmap focal loss
    (losses/gaussian_focal_loss.py:10-25): pred is POST-sigmoid; exact-1
    targets are positives, everything else penalized with a
    (1-target)^gamma neighborhood discount."""
    eps = 1e-12
    pos_w = (gaussian_target == 1.0).astype(pred.dtype)
    neg_w = (1 - gaussian_target) ** gamma
    pos = -jnp.log(pred + eps) * (1 - pred) ** alpha * pos_w
    neg = -jnp.log(1 - pred + eps) * pred ** alpha * neg_w * (1 - pos_w)
    return pos + neg


@_weighted
def varifocal_loss(pred, target, alpha: float = 0.75, gamma: float = 2.0,
                   iou_weighted: bool = True):
    """Varifocal loss (losses/varifocal_loss.py:12-60, the VFNet loss):
    IoU-aware BCE on logits where positives (target = IoU quality q > 0)
    are weighted by q itself and negatives by alpha * p^gamma — an
    asymmetric focal treatment that keeps the positive gradient
    un-downweighted."""
    p = jax.nn.sigmoid(pred)
    pos = (target > 0).astype(pred.dtype)
    focal_w = (target if iou_weighted else 1.0) * pos \
        + alpha * (p ** gamma) * (1 - pos)
    return binary_cross_entropy_with_logits(pred, target) * focal_w


@_weighted
def balanced_l1_loss(pred, target, beta: float = 1.0, alpha: float = 0.5,
                     gamma: float = 1.5):
    """Balanced L1 (Libra R-CNN, losses/balanced_l1_loss.py:10-56):
    promotes inlier gradients — log-shaped inside beta, linear outside,
    C1-continuous at the knee (b = exp(gamma/alpha) - 1)."""
    import numpy as np
    b = np.e ** (gamma / alpha) - 1
    d = jnp.abs(pred - target)
    inner = (alpha / b) * (b * d + 1) * jnp.log(b * d / beta + 1) \
        - alpha * d
    outer = gamma * d + gamma / b - alpha * beta
    return jnp.where(d < beta, inner, outer)


@_weighted
def bce_loss(pred, target):
    """Weighted BCE on logits (mmdet CrossEntropyLoss(use_sigmoid=True) —
    the FCOS centerness loss)."""
    return binary_cross_entropy_with_logits(pred, target)


@_weighted
def cross_entropy_loss(pred, label, class_weight=None):
    """Softmax CE with integer labels; (N, C) x (N,) -> (N,)."""
    logp = jax.nn.log_softmax(pred, axis=-1)
    ll = jnp.take_along_axis(logp, label[..., None], axis=-1)[..., 0]
    loss = -ll
    if class_weight is not None:
        loss = loss * class_weight[label]
    return loss


def _ghm_weights(g, valid, tot, edges, bins, momentum, acc_sum):
    """Shared GHM binning (losses/ghm_loss.py:95-113,195-212): uniform
    gradient-norm bins, per-element weight tot/num_in_bin (or the EMA
    acc_sum when momentum > 0), normalized by the number of occupied bins.

    Static-shape redesign: the reference's python loop over bins with
    ``.item()`` branches becomes a searchsorted bin index + bincount —
    identical arithmetic, one pass, jit-compatible. acc_sum[i] is updated
    ONLY for bins occupied this call (ghm_loss.py:104-106). Returns
    (element_weights, new_acc_sum)."""
    gf = g.reshape(-1)
    vf = valid.reshape(-1)
    # edges[i] <= g < edges[i+1]  <=>  searchsorted(edges, g, 'right') - 1
    idx = jnp.clip(
        jnp.searchsorted(edges, gf, side="right") - 1, 0, bins - 1)
    num_in_bin = jnp.bincount(
        jnp.where(vf, idx, bins - 1),
        weights=vf.astype(jnp.float32), length=bins)
    occupied = num_in_bin > 0
    n = jnp.maximum(occupied.sum().astype(jnp.float32), 1.0)
    if momentum > 0:
        new_acc = jnp.where(occupied,
                            momentum * acc_sum
                            + (1 - momentum) * num_in_bin, acc_sum)
        denom = new_acc
    else:
        new_acc = acc_sum
        denom = num_in_bin
    per_bin = jnp.where(occupied, tot / jnp.maximum(denom, 1e-12), 0.0) / n
    weights = jnp.where(vf, per_bin[idx], 0.0).reshape(g.shape)
    return weights, new_acc


def ghm_c_loss(pred, target, label_weight, bins: int = 10,
               momentum: float = 0.0, acc_sum=None):
    """GHM-C classification loss (GHMC, losses/ghm_loss.py:23-118;
    configs/ghm: bins=30, momentum=0.75): BCE-with-logits reweighted by
    inverse gradient density |sigmoid(pred) - target|, averaged over the
    valid-element count (NOT num_pos — GHMC ignores the head's
    avg_factor). Functional EMA state: pass/receive ``acc_sum`` (bins,)
    when momentum > 0. Returns (loss, new_acc_sum)."""
    edges = (jnp.arange(bins + 1, dtype=jnp.float32) / bins).at[-1].add(1e-6)
    if acc_sum is None:
        acc_sum = jnp.zeros((bins,), jnp.float32)
    valid = label_weight > 0
    tot = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
    g = jnp.abs(jax.lax.stop_gradient(jax.nn.sigmoid(pred)) - target)
    weights, new_acc = _ghm_weights(
        g, valid, tot, edges, bins, momentum, acc_sum)
    loss = binary_cross_entropy_with_logits(pred, target)
    return weight_reduce_loss(loss, weights, "mean", tot), new_acc


def ghm_r_loss(pred, target, label_weight, mu: float = 0.02,
               bins: int = 10, momentum: float = 0.0, acc_sum=None):
    """GHM-R regression loss (GHMR, losses/ghm_loss.py:121-215; configs/
    ghm: mu=0.02, bins=10, momentum=0.7, loss_weight=10): authentic
    smooth-L1 sqrt(d^2 + mu^2) - mu with inverse-gradient-density
    weights over g = |d / sqrt(d^2 + mu^2)|; tot is the label_weight SUM
    (4 x num_pos for (N, 4) box weights), not the valid count
    (ghm_loss.py:196). Returns (loss, new_acc_sum)."""
    edges = (jnp.arange(bins + 1, dtype=jnp.float32) / bins).at[-1].set(1e3)
    if acc_sum is None:
        acc_sum = jnp.zeros((bins,), jnp.float32)
    diff = pred - target
    loss = jnp.sqrt(diff * diff + mu * mu) - mu
    g = jax.lax.stop_gradient(
        jnp.abs(diff / jnp.sqrt(mu * mu + diff * diff)))
    tot = jnp.maximum(label_weight.astype(jnp.float32).sum(), 1.0)
    weights, new_acc = _ghm_weights(
        g, label_weight > 0, tot, edges, bins, momentum, acc_sum)
    return weight_reduce_loss(loss, weights, "mean", tot), new_acc


def seesaw_ce_loss(cls_score, labels, cum_samples, num_classes: int,
                   p: float = 0.8, q: float = 2.0, eps: float = 1e-2,
                   weight=None, avg_factor=None):
    """Seesaw CE over the CLASS logits (losses/seesaw_loss.py:12-78;
    defaults p=0.8, q=2.0, eps=1e-2 per SeesawLoss/configs/seesaw_loss).

    Per-element dampening of negative-class gradients: the mitigation
    factor (N_j/N_i)^p for rarer j, and the compensation factor
    (s_j/s_i)^q for misclassified j, enter as additive log-space offsets
    on the non-target logits before softmax CE.

    Static-shape contract: the reference slices to positive rows before
    calling; here ALL rows are passed and background/padded rows carry
    ``weight`` 0 (labels are clipped for the gathers). ``cum_samples``
    is the per-class running count buffer (first num_classes entries of
    the (C+1,) state tensor)."""
    C = num_classes
    lab = jnp.clip(labels, 0, C - 1)
    onehot = jax.nn.one_hot(lab, C)
    seesaw = jnp.ones_like(cls_score)
    if p > 0:
        cs = jnp.maximum(cum_samples[:C].astype(jnp.float32), 1.0)
        ratio = cs[None, :] / cs[:, None]               # [i, j] = N_j / N_i
        mit = jnp.where(ratio < 1.0, ratio ** p, 1.0)
        seesaw = seesaw * mit[lab]
    if q > 0:
        scores = jax.lax.stop_gradient(jax.nn.softmax(cls_score, axis=-1))
        self_s = jnp.take_along_axis(scores, lab[:, None], axis=-1)
        sm = scores / jnp.maximum(self_s, eps)
        comp = jnp.where(sm > 1.0, sm ** q, 1.0)
        seesaw = seesaw * comp
    adjusted = cls_score + jnp.log(seesaw) * (1.0 - onehot)
    logp = jax.nn.log_softmax(adjusted, axis=-1)
    loss = -jnp.take_along_axis(logp, lab[:, None], axis=-1)[:, 0]
    return weight_reduce_loss(loss, weight, "mean", avg_factor)


def ae_loss(tl_emb, br_emb, valid, margin: float = 1.0):
    """Associative-embedding pull/push (losses/ae_loss.py:11-103), batched
    under static shapes.

    Inputs are the 1-d corner embeddings gathered at each gt's top-left /
    bottom-right cells, (B, G), with ``valid`` masking the padded gt rows.
    Per image i with N_i objects (the reference's per-image normalization,
    then SUMMED over the batch — AssociativeEmbeddingLoss accumulates
    ``pull_all += pull`` per image):

      pull_i = sum_g [(tl-m)^2 + (br-m)^2] / N_i,   m = (tl+br)/2
      push_i = sum_{j!=k} relu(margin - |m_j - m_k|) / (N_i (N_i - 1))

    N_i == 0 gives 0/0-free zeros; N_i == 1 gives zero push (the eye-masked
    pair matrix is empty and the denominator clamps to 1)."""
    v = valid.astype(jnp.float32)                      # (B, G)
    n = v.sum(-1)                                      # (B,)
    mean = (tl_emb + br_emb) / 2
    pull_num = (((tl_emb - mean) ** 2 + (br_emb - mean) ** 2) * v).sum(-1)
    pull = pull_num / jnp.maximum(n, 1.0)              # (B,)
    G = tl_emb.shape[-1]
    pair_v = v[:, :, None] * v[:, None, :] * (1 - jnp.eye(G)[None])
    dist = jnp.abs(mean[:, :, None] - mean[:, None, :])
    push_num = (jnp.clip(margin - dist, 0) * pair_v).sum((-2, -1))
    push = push_num / jnp.maximum(n * (n - 1), 1.0)    # (B,)
    return pull.sum(), push.sum()


def accuracy(pred, target, topk=1, thresh=None, valid=None):
    """Top-k classification accuracy (losses/accuracy.py:5-63): fraction of
    rows whose target class appears in the top-k logits (optionally also
    requiring the logit to exceed ``thresh``). Returns a scalar in [0, 100]
    (the reference's percentage convention); ``valid`` masks padded rows."""
    k = min(int(topk), pred.shape[-1])
    _, idx = jax.lax.top_k(pred, k)                    # (N, k)
    correct = (idx == target[..., None])
    if thresh is not None:
        vals = jnp.take_along_axis(pred, idx, axis=-1)
        correct = correct & (vals > thresh)
    hit = correct.any(-1).astype(jnp.float32)
    if valid is None:
        return 100.0 * hit.mean()
    v = valid.astype(jnp.float32)
    return 100.0 * (hit * v).sum() / jnp.maximum(v.sum(), 1.0)


# ---------------------------------------------------------------------------
# configured wrappers (carry loss_weight like the reference's Loss modules)
# ---------------------------------------------------------------------------

class WeightedLoss:
    """Callable wrapper binding loss_weight / reduction / extra kwargs."""

    def __init__(self, fn, loss_weight=1.0, reduction="mean", **kwargs):
        self.fn = fn
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.kwargs = kwargs

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * self.fn(
            pred, target, weight=weight, reduction=reduction,
            avg_factor=avg_factor, **self.kwargs)


LOSS_REGISTRY = {
    "L1Loss": l1_loss,
    "SmoothL1Loss": smooth_l1_loss,
    "MSELoss": mse_loss,
    "GIoULoss": giou_loss,
    "IoULoss": iou_loss,
    "DIoULoss": diou_loss,
    "CIoULoss": ciou_loss,
    "QualityFocalLoss": quality_focal_loss,
    "DistributionFocalLoss": distribution_focal_loss,
    "KnowledgeDistillationKLDivLoss": kd_kl_div_loss,
    "FocalLoss": sigmoid_focal_loss,
    "CrossEntropyLoss": cross_entropy_loss,
}


def build_loss(cfg: dict) -> WeightedLoss:
    """Build a configured loss from an mmdet-style dict (typed-config bridge)."""
    cfg = dict(cfg)
    kind = cfg.pop("type")
    cfg.pop("use_sigmoid", None)
    fn = LOSS_REGISTRY[kind]
    return WeightedLoss(fn, **cfg)

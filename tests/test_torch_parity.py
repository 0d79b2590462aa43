"""Numerical parity against the reference's pure-torch loss math.

Each oracle below re-implements the reference formula in torch-CPU
(file:line cited per function) and is evaluated on random fixtures against
the dskd_tpu implementation. This is the per-loss-key agreement harness the
mAP-parity claim rests on: same inputs -> same loss values within fp
tolerance.

Oracles are derived from:
  * quality_focal_loss / distribution_focal_loss —
    mmdet/models/losses/gfocal_loss.py:12-124
  * knowledge_distillation_kl_div_loss — mmdet/models/losses/kd_loss.py:12-43
  * weight_reduce_loss protocol — mmdet/models/losses/utils.py:30-59
  * GIoU — mmdet/models/losses/iou_loss.py (giou_loss) via torchvision-free
    closed form
  * Integral_average (raw-sum normalization quirk) —
    mmdet/models/dense_heads/gfl_deformable_detr_head_il.py:23-60
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dskd_tpu.core import losses as L
from dskd_tpu.core.integral import integral_average

SEEDS = [0, 1, 2]


def _reduce_torch(loss, weight=None, avg_factor=None):
    """mmdet weight_reduce_loss (losses/utils.py:30-59), reduction='mean'."""
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return loss.mean()
    eps = torch.finfo(torch.float32).eps
    return loss.sum() / (avg_factor + eps)


def torch_qfl(pred, label, score, beta=2.0):
    """gfocal_loss.py:12-52 verbatim formula."""
    pred_sigmoid = pred.sigmoid()
    scale_factor = pred_sigmoid
    zerolabel = torch.zeros_like(pred)
    loss = F.binary_cross_entropy_with_logits(
        pred, zerolabel, reduction="none") * scale_factor.pow(beta)
    bg = pred.size(1)
    pos = torch.nonzero((label >= 0) & (label < bg)).squeeze(1)
    pos_label = label[pos].long()
    scale_factor = score[pos] - pred_sigmoid[pos, pos_label]
    loss[pos, pos_label] = F.binary_cross_entropy_with_logits(
        pred[pos, pos_label], score[pos],
        reduction="none") * scale_factor.abs().pow(beta)
    return loss.sum(dim=1)


def torch_dfl(pred, label):
    """gfocal_loss.py:103-124 verbatim formula."""
    dis_left = label.long()
    dis_right = dis_left + 1
    weight_left = dis_right.float() - label
    weight_right = label - dis_left.float()
    return (F.cross_entropy(pred, dis_left, reduction="none") * weight_left
            + F.cross_entropy(pred, dis_right,
                              reduction="none") * weight_right)


def torch_kd(pred, soft_label, T):
    """kd_loss.py:12-43 verbatim formula."""
    target = F.softmax(soft_label / T, dim=1).detach()
    return F.kl_div(F.log_softmax(pred / T, dim=1), target,
                    reduction="none").mean(1) * (T * T)


def torch_giou(pred, target, eps=1e-7):
    """iou_loss.py giou_loss: 1 - GIoU, the bbox_overlaps(mode='giou')
    closed form."""
    lt = torch.max(pred[:, :2], target[:, :2])
    rb = torch.min(pred[:, 2:], target[:, 2:])
    wh = (rb - lt).clamp(min=0)
    overlap = wh[:, 0] * wh[:, 1]
    ap = (pred[:, 2] - pred[:, 0]) * (pred[:, 3] - pred[:, 1])
    ag = (target[:, 2] - target[:, 0]) * (target[:, 3] - target[:, 1])
    union = ap + ag - overlap + eps
    ious = overlap / union
    lt_e = torch.min(pred[:, :2], target[:, :2])
    rb_e = torch.max(pred[:, 2:], target[:, 2:])
    wh_e = (rb_e - lt_e).clamp(min=0)
    enclose = wh_e[:, 0] * wh_e[:, 1] + eps
    gious = ious - (enclose - union) / enclose
    return 1 - gious


def torch_integral_average(x, reg_max=16):
    """gfl_deformable_detr_head_il.py:42-59 verbatim (raw-sum quirk)."""
    x = x.reshape(-1, reg_max + 1)
    x = x / x.sum(1).unsqueeze(1).repeat(1, reg_max + 1)
    space = torch.linspace(0, reg_max, reg_max + 1)
    space = space / reg_max / 2
    x = x * space
    return x.sum(1).reshape(-1, 2, 2).sum(2)


@pytest.mark.parametrize("seed", SEEDS)
def test_qfl_parity(seed):
    rng = np.random.RandomState(seed)
    N, C = 64, 10
    pred = rng.randn(N, C).astype(np.float32) * 2
    label = rng.randint(0, C + 1, N).astype(np.int64)   # C == background
    score = np.where(label < C, rng.rand(N), 0.0).astype(np.float32)
    weight = rng.rand(N).astype(np.float32)
    avg = float(max((label < C).sum(), 1))

    want = _reduce_torch(
        torch_qfl(torch.tensor(pred), torch.tensor(label),
                  torch.tensor(score)),
        torch.tensor(weight), avg).item()
    got = float(L.quality_focal_loss(
        jnp.asarray(pred), (jnp.asarray(label), jnp.asarray(score)),
        weight=jnp.asarray(weight), avg_factor=avg))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("seed", SEEDS)
def test_dfl_parity(seed):
    rng = np.random.RandomState(seed)
    N, n_bins = 64, 17
    pred = rng.randn(N, n_bins).astype(np.float32)
    label = (rng.rand(N) * (n_bins - 1 - 1e-3)).astype(np.float32)
    weight = rng.rand(N).astype(np.float32)
    avg = 13.7

    want = _reduce_torch(
        torch_dfl(torch.tensor(pred), torch.tensor(label)),
        torch.tensor(weight), avg).item()
    got = float(L.distribution_focal_loss(
        jnp.asarray(pred), jnp.asarray(label),
        weight=jnp.asarray(weight), avg_factor=avg))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("T", [2.0, 10.0])
def test_kd_parity(seed, T):
    rng = np.random.RandomState(seed)
    N, C = 48, 20
    pred = rng.randn(N, C).astype(np.float32) * 3
    soft = rng.randn(N, C).astype(np.float32) * 3
    weight = rng.rand(N).astype(np.float32)
    avg = 11.0

    want = _reduce_torch(
        torch_kd(torch.tensor(pred), torch.tensor(soft), T),
        torch.tensor(weight), avg).item()
    got = float(L.kd_kl_div_loss(
        jnp.asarray(pred), jnp.asarray(soft),
        weight=jnp.asarray(weight), avg_factor=avg, T=T))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("seed", SEEDS)
def test_giou_parity(seed):
    rng = np.random.RandomState(seed)
    N = 64
    xy = rng.rand(N, 2).astype(np.float32) * 100
    wh = rng.rand(N, 2).astype(np.float32) * 50 + 1
    pred = np.concatenate([xy, xy + wh], -1)
    xy2 = xy + rng.randn(N, 2).astype(np.float32) * 10
    wh2 = rng.rand(N, 2).astype(np.float32) * 50 + 1
    target = np.concatenate([xy2, xy2 + wh2], -1)
    weight = rng.rand(N).astype(np.float32)
    avg = 23.0

    want = _reduce_torch(
        torch_giou(torch.tensor(pred), torch.tensor(target)),
        torch.tensor(weight), avg).item()
    got = float(L.giou_loss(jnp.asarray(pred), jnp.asarray(target),
                            weight=jnp.asarray(weight), avg_factor=avg))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("seed", SEEDS)
def test_integral_average_parity(seed):
    rng = np.random.RandomState(seed)
    N, reg_max = 32, 16
    # the head feeds sigmoided (positive) distributions
    x = 1.0 / (1.0 + np.exp(-rng.randn(N, 4 * (reg_max + 1)))) \
        .astype(np.float32)
    want = torch_integral_average(torch.tensor(x), reg_max).numpy()
    got = np.asarray(integral_average(jnp.asarray(x), reg_max))
    np.testing.assert_allclose(got.reshape(-1, 2), want, rtol=2e-5,
                               atol=2e-6)


@pytest.mark.parametrize("seed", SEEDS)
def test_smooth_l1_parity(seed):
    rng = np.random.RandomState(seed)
    N = 100
    pred = rng.randn(N, 4).astype(np.float32) * 3
    target = rng.randn(N, 4).astype(np.float32) * 3
    weight = rng.rand(N, 4).astype(np.float32)
    avg = 17.0
    want = _reduce_torch(
        F.smooth_l1_loss(torch.tensor(pred), torch.tensor(target),
                         reduction="none", beta=1.0),
        torch.tensor(weight), avg).item()
    got = float(L.smooth_l1_loss(jnp.asarray(pred), jnp.asarray(target),
                                 weight=jnp.asarray(weight), avg_factor=avg))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_corr_distill_parity():
    """loss_corr: prototype accumulation + L2 distance-matrix MSE against a
    torch oracle of gfl_deformable_detr_head_il.py:525-555 + 1197-1222
    (incl. the idx_s = nonzero(num_t) quirk). Fixtures keep every
    teacher-seen prev class student-populated — the reference divides the
    student prototype by its own count unguarded (0/0 -> NaN), which our
    implementation guards; that divergence is intentional and documented."""
    from collections import namedtuple

    from dskd_tpu.distill.losses import DistillConfig, corr_loss

    B, Q, C, num_classes, prev, K = 2, 20, 8, 6, 3, 5
    rng = np.random.RandomState(1)
    s_hs = rng.randn(B, Q, C).astype(np.float32)
    t_hs = rng.randn(B, Q, C).astype(np.float32)
    # assignment labels: bg = num_classes; ensure every prev class appears
    s_labels = rng.randint(0, num_classes + 1, (B, Q)).astype(np.int32)
    s_labels[0, :3] = [0, 1, 2]
    keep_qid = np.stack([rng.choice(Q, K, replace=False)
                         for _ in range(B)]).astype(np.int32)
    t_labels = rng.randint(0, num_classes, (B, K)).astype(np.int32)
    t_labels[0, :3] = [0, 1, 2]
    valid = np.ones((B, K), bool)

    # ---- torch oracle (reference accumulation, :525-551) ----
    hs_student = torch.tensor(s_hs).reshape(-1, C)
    student_labels_all = torch.tensor(s_labels).reshape(-1)
    corr_student = torch.zeros(num_classes + 1, C + 1)
    teacher_only = torch.zeros_like(student_labels_all)
    for t_label in range(prev):
        teacher_only[student_labels_all == t_label] = 1
    for idx in torch.nonzero(teacher_only):
        corr_student[student_labels_all[idx][0]][:-1] += hs_student[idx][0]
        corr_student[student_labels_all[idx][0]][-1] += 1

    hs_teacher = torch.tensor(t_hs).reshape(-1, C)
    teacher_id = torch.tensor(
        (keep_qid + np.arange(B)[:, None] * Q).reshape(-1))
    teacher_labels_all = torch.tensor(t_labels.reshape(-1))
    corr_teacher = torch.zeros(num_classes + 1, C + 1)
    for i in range(len(teacher_labels_all)):
        corr_teacher[teacher_labels_all[i]][:-1] += hs_teacher[teacher_id[i]]
        corr_teacher[teacher_labels_all[i]][-1] += 1

    # ---- correlation_mat (:1197-1222) ----
    c_t = corr_teacher[:prev, :-1].clone()
    num_t = corr_teacher[:prev, -1]
    idx_t = torch.nonzero(num_t).squeeze(1)
    c_t[idx_t] = c_t[idx_t] / num_t[idx_t].unsqueeze(1)
    c_s = corr_student[:prev, :-1].clone()
    num_s = corr_student[:prev, -1]
    idx_s = torch.nonzero(num_t).squeeze(1)      # the reference quirk
    c_s[idx_s] = c_s[idx_s] / num_s[idx_s].unsqueeze(1)
    l = prev
    mat_t = torch.zeros(l, l)
    mat_s = torch.zeros(l, l)
    for i in range(l):
        for j in range(l):
            mat_t[i][j] = torch.dist(c_t[i], c_t[j], p=2)
            mat_s[i][j] = torch.dist(c_s[i], c_s[j], p=2)
    want = float(torch.nn.functional.mse_loss(mat_t, mat_s) / l)

    # ---- ours ----
    Det = namedtuple("Det", ["labels", "keep_qid", "valid"])
    cfg = DistillConfig.from_flags(feats_distill="corr", num_prev=prev)
    got = float(corr_loss(
        jnp.asarray(s_hs), jnp.asarray(s_labels), jnp.asarray(t_hs),
        Det(jnp.asarray(t_labels), jnp.asarray(keep_qid),
            jnp.asarray(valid)),
        num_query=Q, num_classes=num_classes, cfg=cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

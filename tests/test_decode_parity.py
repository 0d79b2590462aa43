"""decode_v1 / decode_v2 semantic-guided fg-distill torch-oracle parity.

Oracle re-derives the reference's loop semantics
(gfl_deformable_detr_head_il.py:664-718 decode_v1, :721-772 decode_v2):
per level, per image, each kept teacher box rasterizes a per-channel
semantic softmax mask onto the neck map with [hmin:hmax, wmin:wmax)
EXCLUSIVE bounds, later boxes overwriting earlier ones in overlaps; the
KD KL (kd_loss.py:12-43, dim=1 == the H axis of a (C, H, W) image slice,
reduction='sum', T=2) is taken with pred = TEACHER-masked features and
target = STUDENT-masked features (the reference's pred/target swap,
preserved in dskd_tpu/distill/losses.py semantic_guided_fg_loss), summed
over levels and divided by B.
"""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from dskd_tpu.distill.losses import DistillConfig, semantic_guided_fg_loss
from dskd_tpu.distill.teacher import TeacherInfo
from dskd_tpu.models.gfl_detr_head import DetResults, HeadOutputs

B, Q, C, KT = 2, 12, 8, 4
LEVELS = ((6, 8), (3, 4))


def _fixture(seed, fg_mode, partial_valid=False):
    rng = np.random.RandomState(seed)
    img_hw = np.array([[48, 64], [40, 56]], np.int32)
    s_hs = rng.randn(2, B, Q, C).astype(np.float32)
    t_hs = rng.randn(2, B, Q, C).astype(np.float32)
    s_neck = [rng.randn(B, H, W, C).astype(np.float32) for H, W in LEVELS]
    t_neck = [rng.randn(B, H, W, C).astype(np.float32) for H, W in LEVELS]

    xy = rng.rand(B, KT, 2).astype(np.float32) * 25
    wh = rng.rand(B, KT, 2).astype(np.float32) * 20 + 4
    bboxes = np.concatenate([xy, np.minimum(
        xy + wh, np.array([56, 40], np.float32))], -1)
    keep_qid = np.stack([rng.choice(Q, KT, replace=False)
                         for _ in range(B)]).astype(np.int32)
    q_of_gt = np.stack([rng.choice(Q, KT, replace=False)
                        for _ in range(B)]).astype(np.int32)
    valid = np.ones((B, KT), bool)
    if partial_valid:
        valid[0, -1] = False
        valid[1, -2:] = False

    cfg = DistillConfig.from_flags(
        cates_distill="hard", feats_distill=f"fg_info + {fg_mode}",
        num_prev=4)
    dummy_det = DetResults(
        bboxes=jnp.asarray(bboxes), scores=jnp.zeros((B, KT)),
        labels=jnp.zeros((B, KT), jnp.int32), logits=jnp.zeros((B, KT, 4)),
        keep_qid=jnp.asarray(keep_qid), valid=jnp.asarray(valid))
    student = HeadOutputs(
        cls_scores=jnp.zeros((2, B, Q, 4)),
        bbox_preds=jnp.zeros((2, B, Q, 4)),
        memory=jnp.zeros((B, 4, C)), hs=jnp.asarray(s_hs),
        mask_flat=jnp.zeros((B, 4), bool))
    teacher = TeacherInfo(
        neck_feats=tuple(jnp.asarray(f) for f in t_neck),
        cls_scores=jnp.zeros((2, B, Q, 4)),
        bbox_preds=jnp.zeros((2, B, Q, 4)),
        memory=jnp.zeros((B, 4, C)), hs=jnp.asarray(t_hs), det=dummy_det)
    return (img_hw, s_hs, t_hs, s_neck, t_neck, bboxes, keep_qid, q_of_gt,
            valid, cfg, student, teacher)


def _kd_sum(pred, target, T=2.0):
    """KnowledgeDistillationKLDivLoss(T=2, reduction='sum') on (C, H, W)."""
    kl = F.kl_div(F.log_softmax(pred / T, dim=1),
                  F.softmax(target / T, dim=1),
                  reduction="none").mean(1) * T * T
    return kl.sum()


def _oracle(img_hw, s_hs, t_hs, s_neck, t_neck, bboxes, keep_qid, q_of_gt,
            valid, fg_mode):
    fg_loss = torch.zeros(())
    for sp, (H, W) in enumerate(LEVELS):
        feats_student = torch.tensor(s_neck[sp]).permute(0, 3, 1, 2)
        feats_teacher = torch.tensor(t_neck[sp]).permute(0, 3, 1, 2)
        for i in range(B):
            mask_hs = torch.zeros(C, H, W)
            h_img, w_img = float(img_hw[i, 0]), float(img_hw[i, 1])
            for j in range(KT):
                if not valid[i, j]:
                    continue
                wmin = int(np.floor(bboxes[i, j, 0] / w_img * W))
                wmax = int(np.ceil(bboxes[i, j, 2] / w_img * W))
                hmin = int(np.floor(bboxes[i, j, 1] / h_img * H))
                hmax = int(np.ceil(bboxes[i, j, 3] / h_img * H))
                th = torch.tensor(t_hs[-1][i, keep_qid[i, j]])
                if fg_mode == "decode_v1":
                    sh = torch.tensor(s_hs[-1][i, q_of_gt[i, j]])
                    sem = torch.abs(th - sh).softmax(0)
                else:
                    sem = th.softmax(0)
                mask_hs[:, hmin:hmax, wmin:wmax] = sem[:, None, None]
            # reference naming swap: 'fg_fea_t' is the STUDENT-masked map
            # (the KD target), 'fg_fea_s' the TEACHER-masked map (the pred)
            fg_loss = fg_loss + _kd_sum(feats_teacher[i] * mask_hs,
                                        feats_student[i] * mask_hs)
    return float(fg_loss / B)


def _run(seed, fg_mode, partial_valid=False):
    (img_hw, s_hs, t_hs, s_neck, t_neck, bboxes, keep_qid, q_of_gt, valid,
     cfg, student, teacher) = _fixture(seed, fg_mode, partial_valid)
    got = float(semantic_guided_fg_loss(
        student, [jnp.asarray(f) for f in s_neck], teacher,
        jnp.asarray(q_of_gt), jnp.asarray(img_hw), cfg))
    want = _oracle(img_hw, s_hs, t_hs, s_neck, t_neck, bboxes, keep_qid,
                   q_of_gt, valid, fg_mode)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_decode_v1_parity():
    for seed in (0, 1, 2):
        _run(seed, "decode_v1")


def test_decode_v2_parity():
    for seed in (0, 3):
        _run(seed, "decode_v2")


def test_decode_v1_parity_partial_valid():
    _run(4, "decode_v1", partial_valid=True)

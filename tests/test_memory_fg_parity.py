"""sg_out / fg_only encoder-memory fg-distill torch-oracle parity.

Oracle re-derives gfl_deformable_detr_head_il.py :860-925 (sg_out) and
:1082-1129 (fg_only): the encoder memory is sliced per level into
(C, H, W) maps; the fg mask uses INCLUSIVE [+1] bounds (sg_out: binary
teacher-box coverage minus ORIGINAL-GT coverage; fg_only: per-pixel max
of 1/inclusive-area over covering teacher boxes), is sqrt-ed, and the KD
KL (dim=1 == H, T=2, reduction='sum') runs with pred = the TEACHER
memory ('memory_soft') and target = the STUDENT memory ('memory_pred'
— the reference's naming swap), summed over images and levels, / B.
"""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from dskd_tpu.distill.losses import DistillConfig, memory_fg_loss
from dskd_tpu.distill.teacher import TeacherInfo
from dskd_tpu.models.gfl_detr_head import DetResults, HeadOutputs

B, Q, C, KT, GN = 2, 10, 8, 3, 2
LEVELS = ((6, 8), (3, 4))
S = sum(h * w for h, w in LEVELS)


def _fixture(seed, mode):
    rng = np.random.RandomState(seed)
    img_hw = np.array([[48, 64], [40, 56]], np.int32)
    mem_s = rng.randn(B, S, C).astype(np.float32)
    mem_t = rng.randn(B, S, C).astype(np.float32)
    s_neck = [rng.randn(B, h, w, C).astype(np.float32) for h, w in LEVELS]
    t_neck = [rng.randn(B, h, w, C).astype(np.float32) for h, w in LEVELS]

    def boxes(k):
        xy = rng.rand(B, k, 2).astype(np.float32) * 25
        wh = rng.rand(B, k, 2).astype(np.float32) * 20 + 4
        return np.concatenate([xy, np.minimum(
            xy + wh, np.array([56, 40], np.float32))], -1)

    det_boxes = boxes(KT)
    gt_boxes = boxes(GN)
    det_valid = np.ones((B, KT), bool)
    gt_valid = np.ones((B, GN), bool)

    cfg = DistillConfig.from_flags(
        cates_distill="hard", feats_distill=f"fg_info + {mode}",
        num_prev=4)
    det = DetResults(
        bboxes=jnp.asarray(det_boxes), scores=jnp.zeros((B, KT)),
        labels=jnp.zeros((B, KT), jnp.int32), logits=jnp.zeros((B, KT, 4)),
        keep_qid=jnp.zeros((B, KT), jnp.int32),
        valid=jnp.asarray(det_valid))
    student = HeadOutputs(
        cls_scores=jnp.zeros((2, B, Q, 4)),
        bbox_preds=jnp.zeros((2, B, Q, 4)),
        memory=jnp.asarray(mem_s), hs=jnp.zeros((2, B, Q, C)),
        mask_flat=jnp.zeros((B, S), bool))
    teacher = TeacherInfo(
        neck_feats=tuple(jnp.asarray(f) for f in t_neck),
        cls_scores=jnp.zeros((2, B, Q, 4)),
        bbox_preds=jnp.zeros((2, B, Q, 4)),
        memory=jnp.asarray(mem_t), hs=jnp.zeros((2, B, Q, C)), det=det)
    return (img_hw, mem_s, mem_t, s_neck, det_boxes, gt_boxes, cfg,
            student, teacher)


def _kd_sum(pred, target, T=2.0):
    kl = F.kl_div(F.log_softmax(pred / T, dim=1),
                  F.softmax(target / T, dim=1),
                  reduction="none").mean(1) * T * T
    return kl.sum()


def _bounds(box, img_hw_i, H, W):
    h_img, w_img = float(img_hw_i[0]), float(img_hw_i[1])
    wmin = int(np.floor(box[0] / w_img * W))
    wmax = int(np.ceil(box[2] / w_img * W))
    hmin = int(np.floor(box[1] / h_img * H))
    hmax = int(np.ceil(box[3] / h_img * H))
    return wmin, wmax, hmin, hmax


def _oracle(img_hw, mem_s, mem_t, det_boxes, gt_boxes, mode):
    fg_loss = torch.zeros(())
    start = 0
    for (H, W) in LEVELS:
        # (B, S, C) -> per-level (B, C, H, W)
        ms = torch.tensor(mem_s[:, start:start + H * W]) \
            .permute(0, 2, 1).reshape(B, C, H, W)
        mt = torch.tensor(mem_t[:, start:start + H * W]) \
            .permute(0, 2, 1).reshape(B, C, H, W)
        start += H * W
        for i in range(B):
            if mode == "sg_out":
                mask = torch.zeros(H, W)
                for j in range(KT):
                    wmin, wmax, hmin, hmax = _bounds(det_boxes[i, j],
                                                     img_hw[i], H, W)
                    mask[hmin:hmax + 1, wmin:wmax + 1] = 1.0
                for j in range(GN):
                    wmin, wmax, hmin, hmax = _bounds(gt_boxes[i, j],
                                                     img_hw[i], H, W)
                    mask[hmin:hmax + 1, wmin:wmax + 1] = 0.0
            else:   # fg_only
                mask = torch.zeros(H, W)
                for j in range(KT):
                    wmin, wmax, hmin, hmax = _bounds(det_boxes[i, j],
                                                     img_hw[i], H, W)
                    inv = 1.0 / ((hmax + 1 - hmin) * (wmax + 1 - wmin))
                    mask[hmin:hmax + 1, wmin:wmax + 1] = torch.maximum(
                        mask[hmin:hmax + 1, wmin:wmax + 1],
                        torch.tensor(inv))
            m = mask.sqrt().unsqueeze(0)
            # reference naming swap: target = STUDENT memory, pred = TEACHER
            fg_loss = fg_loss + _kd_sum(mt[i] * m, ms[i] * m)
    return float(fg_loss / B)


def _run(seed, mode):
    (img_hw, mem_s, mem_t, s_neck, det_boxes, gt_boxes, cfg, student,
     teacher) = _fixture(seed, mode)
    got = float(memory_fg_loss(
        student, [jnp.asarray(f) for f in s_neck], teacher,
        jnp.asarray(img_hw), cfg,
        gt_bboxes_original=jnp.asarray(gt_boxes),
        gt_valid_original=jnp.asarray(np.ones((B, GN), bool))))
    want = _oracle(img_hw, mem_s, mem_t, det_boxes, gt_boxes, mode)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_sg_out_parity():
    for seed in (0, 1):
        _run(seed, "sg_out")


def test_fg_only_parity():
    for seed in (0, 2):
        _run(seed, "fg_only")


def test_fix_fg_grad_direction_knob():
    """Faithful mode: zero student-memory grads; fixed mode: nonzero grads
    toward the (detached) teacher (DistillConfig.fix_fg_grad_direction)."""
    import jax

    (img_hw, mem_s, mem_t, s_neck, det_boxes, gt_boxes, cfg, student,
     teacher) = _fixture(0, "sg_out")

    def loss_of_student_memory(mem, cfg_):
        st = student._replace(memory=mem)
        return memory_fg_loss(
            st, [jnp.asarray(f) for f in s_neck], teacher,
            jnp.asarray(img_hw), cfg_,
            gt_bboxes_original=jnp.asarray(gt_boxes),
            gt_valid_original=jnp.asarray(np.ones((B, GN), bool)))

    mem = jnp.asarray(mem_s)
    g_faithful = jax.grad(loss_of_student_memory)(mem, cfg)
    assert float(jnp.abs(g_faithful).max()) == 0.0

    cfg_fixed = cfg._replace(fix_fg_grad_direction=True)
    g_fixed = jax.grad(loss_of_student_memory)(mem, cfg_fixed)
    assert float(jnp.abs(g_fixed).max()) > 0.0
    # and the faithful loss VALUE still matches the torch oracle exactly
    want = _oracle(img_hw, mem_s, mem_t, det_boxes, gt_boxes, "sg_out")
    np.testing.assert_allclose(float(loss_of_student_memory(mem, cfg)),
                               want, rtol=2e-4, atol=2e-5)

"""Frozen-teacher forward products for incremental distillation.

Parity target: DeformableDETR_il.out_teacher
(mmdet/models/detectors/deformable_detr_il.py:116-154): run the frozen
teacher, decode its detections with the teacher_test_cfg (score_thr=0.3,
max_per_img=100), and expose {neck_feats, head_outs, pred_keepid,
pred_logits, pred_labels, pred_bboxes} to the student's loss.

TPU-native shape discipline: the reference returns per-image variable-length
prediction lists; here every per-image list is a fixed-size (B, K) array with
a ``valid`` mask, so the whole teacher+student step stays inside one jitted
computation. The teacher is NOT a hidden submodule (the reference plays
``__setattr__`` tricks to keep it out of DDP) — it is simply a second,
non-differentiated parameter pytree passed through the same apply function.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..models.detector import DetectorOutputs
from ..models.gfl_detr_head import DetResults, get_bboxes


class TeacherInfo(NamedTuple):
    neck_feats: Tuple[jnp.ndarray, ...]   # NHWC per level
    cls_scores: jnp.ndarray               # (nl, B, Q, K) raw logits
    bbox_preds: jnp.ndarray               # (nl, B, Q, 2+4*(rm+1))
    memory: jnp.ndarray                   # (B, S, C)
    hs: jnp.ndarray                       # (nl, B, Q, C)
    det: DetResults                       # fixed-size kept predictions


def out_teacher(outputs: DetectorOutputs, img_hw: jnp.ndarray,
                reg_max: int = 16, score_thr: float = 0.3,
                max_per_img: int = 100) -> TeacherInfo:
    """Distill products from a frozen teacher's forward outputs."""
    head = outputs.head
    det = get_bboxes(head.cls_scores[-1], head.bbox_preds[-1], img_hw,
                     reg_max=reg_max, score_thr=score_thr,
                     max_per_img=max_per_img, rescale=False)
    stop = jax.lax.stop_gradient
    return TeacherInfo(
        neck_feats=tuple(stop(f) for f in outputs.neck_feats),
        cls_scores=stop(head.cls_scores),
        bbox_preds=stop(head.bbox_preds),
        memory=stop(head.memory),
        hs=stop(head.hs),
        det=jax.tree.map(stop, det))


def merge_teacher_gt(teacher_det: DetResults, gt_bboxes, gt_labels,
                     gt_valid):
    """Hard distillation: GT <- teacher predictions ++ GT (teacher first).

    Parity: gfl_deformable_detr_head_il.py:462-465 concatenates teacher
    predictions BEFORE the ground truth (order preserved — it fixes which
    merged-GT row index corresponds to which teacher prediction, used by the
    soft/corr/fg pairings).

    Returns (bboxes (B, K+G, 4), labels (B, K+G), valid (B, K+G)).
    """
    boxes = jnp.concatenate([teacher_det.bboxes, gt_bboxes], axis=1)
    labels = jnp.concatenate(
        [teacher_det.labels.astype(gt_labels.dtype), gt_labels], axis=1)
    valid = jnp.concatenate([teacher_det.valid, gt_valid], axis=1)
    return boxes, labels, valid

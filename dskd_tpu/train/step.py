"""The jitted train/eval steps — standard and incremental (teacher+student).

Parity target: the reference's hot loop (SURVEY §3.2):
DeformableDETR_il.forward_train -> out_teacher (no-grad teacher forward) ->
student forward -> head.loss (detection on merged GT + distill menu) ->
_parse_losses (sum of every 'loss' key) -> backward -> clip(0.1) -> AdamW.

Everything here is one traced computation: the teacher forward, the
device-side Hungarian assignment, every distill branch (statically
configured), the global-batch avg factors (GSPMD gives the reference's
cross-rank reduce_mean for free), the optimizer update.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..distill.losses import DistillConfig, distill_losses
from ..distill.teacher import merge_teacher_gt, out_teacher
from ..models.gfl_detr_loss import DetLossConfig, detection_loss
from .state import TrainState


# Batch lives in the jax-free data.batch module (process-worker loaders
# must import it without initializing a backend); re-exported here so
# `from .step import Batch` keeps working everywhere.
from ..data.batch import Batch  # noqa: F401


def _cast_floats(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def teacher_info(model, teacher_variables, batch: Batch,
                 det_cfg: DetLossConfig, teacher_score_thr: float = 0.3,
                 teacher_max_per_img: int = 100,
                 compute_dtype=jnp.float32):
    """Frozen-teacher forward -> TeacherInfo (reference out_teacher,
    deformable_detr_il.py:116-154).

    Runs with remat OFF: the teacher has no backward, so rematerialization
    buys nothing and costs the scheduler fusion freedom (PERF.md item 4).
    Call this OUTSIDE value_and_grad so autodiff never traces it.
    """
    tmodel = (model.clone(remat=False)
              if getattr(model, "remat", None) is not None else model)
    images = batch.images
    if compute_dtype != jnp.float32:
        teacher_variables = _cast_floats(teacher_variables, compute_dtype)
        images = images.astype(compute_dtype)
    import os
    if os.environ.get("DSKD_INT8_TEACHER", "0") == "1":
        # the frozen teacher has no backward: run its big Dense/Conv
        # layers s8 x s8 -> s32 on the MXU (ops/int8.py; measured knob)
        from ..ops.int8 import apply_int8
        t_out = apply_int8(tmodel, teacher_variables, images, batch.img_hw,
                           deterministic=True)
    else:
        t_out = tmodel.apply(teacher_variables, images, batch.img_hw,
                             deterministic=True)
    if compute_dtype != jnp.float32:
        t_out = _cast_floats(t_out, jnp.float32)
    return out_teacher(t_out, batch.img_hw, reg_max=det_cfg.reg_max,
                       score_thr=teacher_score_thr,
                       max_per_img=teacher_max_per_img)


def compute_losses(model, variables, batch: Batch, det_cfg: DetLossConfig,
                   teacher_variables=None,
                   distill_cfg: Optional[DistillConfig] = None,
                   teacher_score_thr: float = 0.3,
                   teacher_max_per_img: int = 100,
                   dropout_rng=None,
                   compute_dtype=jnp.float32,
                   tinfo=None) -> Dict[str, jnp.ndarray]:
    """Forward + all losses. Pure function of (variables, batch).

    ``compute_dtype=bfloat16`` runs the network in bf16 (master params stay
    f32 — the reference's Fp16OptimizerHook analog, loss math in f32; TPU
    MXUs natively prefer bf16 so no loss scaling is needed).
    """
    rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
    if tinfo is None and teacher_variables is not None:
        tinfo = teacher_info(model, teacher_variables, batch, det_cfg,
                             teacher_score_thr, teacher_max_per_img,
                             compute_dtype)
    images = batch.images
    if compute_dtype != jnp.float32:
        variables = _cast_floats(variables, compute_dtype)
        images = images.astype(compute_dtype)
    batch = batch._replace(images=images)
    out = model.apply(variables, batch.images, batch.img_hw,
                      deterministic=dropout_rng is None, rngs=rngs)
    if compute_dtype != jnp.float32:
        out = _cast_floats(out, jnp.float32)

    gt_bboxes, gt_labels, gt_valid = (batch.gt_bboxes, batch.gt_labels,
                                      batch.gt_valid)
    if tinfo is not None:
        if distill_cfg.hard:
            gt_bboxes, gt_labels, gt_valid = merge_teacher_gt(
                tinfo.det, gt_bboxes, gt_labels, gt_valid)

    losses, targets = detection_loss(
        out.head.cls_scores, out.head.bbox_preds, gt_bboxes, gt_labels,
        gt_valid, batch.img_hw, det_cfg)

    if tinfo is not None:
        losses.update(distill_losses(
            out.head, out.neck_feats, tinfo, targets, batch.img_hw,
            det_cfg.num_classes, distill_cfg,
            num_merged=gt_bboxes.shape[1],
            gt_bboxes_original=batch.gt_bboxes,
            gt_valid_original=batch.gt_valid))
    return losses


def parse_losses(losses: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Sum every entry whose key contains 'loss' (reference _parse_losses)."""
    return sum(v for k, v in losses.items() if "loss" in k)


def make_train_step(model, det_cfg: DetLossConfig,
                    distill_cfg: Optional[DistillConfig] = None,
                    teacher_score_thr: float = 0.3,
                    teacher_max_per_img: int = 100,
                    use_dropout: bool = True, donate: bool = True,
                    compute_dtype=jnp.float32):
    """Build the jitted train step. teacher_variables=None => plain training."""

    def train_step(state: TrainState, batch: Batch, teacher_variables=None):
        rng, step_rng = jax.random.split(state.rng)

        # teacher forward runs OUTSIDE value_and_grad: no remat, no vjp
        # tracing — its outputs enter loss_fn as constants
        tinfo = None
        if teacher_variables is not None:
            tinfo = jax.lax.stop_gradient(teacher_info(
                model, teacher_variables, batch, det_cfg,
                teacher_score_thr, teacher_max_per_img, compute_dtype))

        def loss_fn(params):
            losses = compute_losses(
                model, {"params": params,
                        "batch_stats": state.batch_stats},
                batch, det_cfg, teacher_variables, distill_cfg,
                teacher_score_thr, teacher_max_per_img,
                dropout_rng=step_rng if use_dropout else None,
                compute_dtype=compute_dtype, tinfo=tinfo)
            return parse_losses(losses), losses

        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads).replace(rng=rng)
        losses = dict(losses)
        losses["loss"] = total
        return new_state, losses

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())

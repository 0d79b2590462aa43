"""LD: Localization Distillation for dense detectors (parity: mmdet
dense_heads/ld_head.py + detectors/kd_one_stage.py +
configs/ld/ld_r18_gflv1_r101_fpn_coco_1x.py, box AP 36.0 r18<-r101).

A GFL student trained with an extra KL term transferring the TEACHER's
per-side corner DISTRIBUTIONS (the general localization representation)
at the student's positive anchors: loss_ld = KLDiv(T=10, weight 0.25) on
the 4 x (reg_max+1) logits, weighted like DFL (detached max class prob)
and normalized by the global weight sum. The teacher is a frozen GFL
model of the same head geometry (the reference pairs r101 -> r18; here
the teacher arrives as a frozen variables pytree, same protocol as every
other distill family in this repo).
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.atss import atss_assign
from ..core.boxes import bbox_overlaps
from .gfl_head import GFLLossConfig, gfl_anchors, gfl_detection_loss


class LDLossConfig(NamedTuple):
    gfl: GFLLossConfig = GFLLossConfig()
    ld_T: float = 10.0
    ld_weight: float = 0.25


def ld_loss(student_out, teacher_out, gt_bboxes, gt_labels, gt_valid,
            cfg: LDLossConfig) -> Dict[str, jnp.ndarray]:
    """GFL detection losses + the localization-distillation KL."""
    losses = gfl_detection_loss(student_out, gt_bboxes, gt_labels,
                                gt_valid, cfg.gfl)

    g = cfg.gfl
    B = student_out.cls_scores[0].shape[0]
    C = g.num_classes
    n_bins = g.reg_max + 1
    featmap_sizes = [c.shape[1:3] for c in student_out.cls_scores]
    anchors_per_level = gfl_anchors(featmap_sizes, g.strides)
    num_level_anchors = [a.shape[0] for a in anchors_per_level]
    anchors = jnp.concatenate(anchors_per_level, 0)

    assign = jax.vmap(lambda b, l, v: atss_assign(
        anchors, num_level_anchors, b, l, v, C, g.atss_topk))(
        gt_bboxes, gt_labels, gt_valid)
    pos = assign.pos_mask

    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in student_out.cls_scores], 1)
    s_reg = jnp.concatenate(
        [r.reshape(B, -1, 4, n_bins) for r in student_out.bbox_preds], 1)
    t_reg = jnp.concatenate(
        [r.reshape(B, -1, 4, n_bins) for r in teacher_out.bbox_preds], 1)
    t_reg = jax.lax.stop_gradient(t_reg)

    w = jax.lax.stop_gradient(jax.nn.sigmoid(cls_flat).max(-1)) \
        * pos.astype(jnp.float32)                     # (B, N)
    # ld_head.py:240-261: loss_ld keeps its raw avg_factor=4.0 — unlike
    # bbox/dfl it is NOT divided by the summed weight_targets
    kl = L.kd_kl_div_loss(s_reg.reshape(-1, n_bins),
                          t_reg.reshape(-1, n_bins), T=cfg.ld_T,
                          weight=jnp.repeat(w.reshape(-1), 4),
                          avg_factor=4.0)
    losses["loss_ld"] = cfg.ld_weight * kl
    return losses


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        from .gfl import GFL
        m = cfg.model
        return GFL(num_classes=m.num_classes, depth=m.depth,
                   frozen_stages=m.frozen_stages, reg_max=m.reg_max)

    def losses(model, cfg, **_):
        from ..registry import teacher_model
        det_cfg = LDLossConfig(
            gfl=GFLLossConfig(num_classes=cfg.model.num_classes,
                              reg_max=cfg.model.reg_max))
        t_model = teacher_model(model, cfg)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            assert teacher_vars is not None, \
                "arch='ld' requires a frozen teacher (kd_one_stage.py)"
            t_out = t_model.apply(teacher_vars, batch.images,
                                  batch.img_hw, deterministic=True)
            return ld_loss(out.head, t_out.head, batch.gt_bboxes,
                           batch.gt_labels, batch.gt_valid, det_cfg), None
        return losses_fn

    def eval_step(model, **kw):
        from .gfl import _GFL_EVAL_STEP
        return _GFL_EVAL_STEP[0](model, **kw)

    register_family("ld", build=build, losses=losses, eval_step=eval_step)


_register()

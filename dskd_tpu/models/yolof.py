"""YOLOF detector assembly + incremental distillation step.

Parity targets:
  * mmdet/models/detectors/yolof.py (fork, 586 lines): same
    set_teacher/out_teacher protocol as the DETR-IL family — the teacher's
    kept predictions are NMS survivors with their anchor-position keep-ids;
  * yolof_head.py loss distills (:366-400): soft-KD over all anchor
    positions weighted at the teacher's keep-ids, ld-bbox on decoded boxes,
    kldv over the single neck level.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from .dilated_encoder import DilatedEncoder
from .resnet import ResNet
from .yolof_head import (YOLOFHead, YOLOFHeadOutputs, YOLOFLossConfig,
                         yolof_anchors, yolof_detection_loss,
                         yolof_get_bboxes)


class YOLOFOutputs(NamedTuple):
    head: YOLOFHeadOutputs
    neck_feat: jnp.ndarray     # (B, H, W, 512)


class YOLOF(nn.Module):
    """ResNet-50 C5 + DilatedEncoder + YOLOF head (stride 32)."""
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = 1
    num_anchors: int = 5

    @nn.compact
    def __call__(self, images: jnp.ndarray, img_hw: jnp.ndarray,
                 deterministic: bool = True) -> YOLOFOutputs:
        train = not deterministic
        # the YOLOF recipe ships a detectron caffe-style R50 (stride on
        # the bottleneck 1x1, configs/yolof/yolof_r50_c5_8x8_1x_coco.py:15)
        feats = ResNet(depth=self.depth, out_indices=(3,),
                       frozen_stages=self.frozen_stages, style="caffe",
                       name="backbone")(images)
        neck = DilatedEncoder(name="neck")(feats, train=train)
        head = YOLOFHead(num_classes=self.num_classes,
                         num_anchors=self.num_anchors,
                         name="bbox_head")(neck[0], train=train)
        return YOLOFOutputs(head, neck[0])


class YOLOFDistillConfig(NamedTuple):
    hard: bool = True
    soft: bool = False
    ld_bbox: bool = False
    feats_kldv: bool = False
    kd_weight: float = 10.0
    kd_T: float = 2.0
    ld_bbox_weight: float = 10.0
    fd_weight: float = 10.0
    fd_T: float = 2.0

    @classmethod
    def from_flags(cls, cates_distill="", locat_distill="",
                   feats_distill="", **kw):
        return cls(hard="hard" in cates_distill,
                   soft="soft" in cates_distill,
                   ld_bbox="bbox" in locat_distill,
                   feats_kldv="kldv" in feats_distill, **kw)


def yolof_teacher_out(outputs: YOLOFOutputs, anchors, img_hw,
                      score_thr: float = 0.3, max_per_img: int = 100):
    """Frozen-teacher detections for distillation (stop-gradded)."""
    stop = jax.lax.stop_gradient
    det = yolof_get_bboxes(outputs.head, anchors, img_hw,
                           score_thr=score_thr, max_per_img=max_per_img)
    return jax.tree.map(stop, det), jax.tree.map(stop, outputs)


def yolof_compute_losses(out: YOLOFOutputs, anchors, batch,
                         det_cfg: YOLOFLossConfig,
                         teacher_out: Optional[YOLOFOutputs] = None,
                         distill_cfg: Optional[YOLOFDistillConfig] = None,
                         teacher_score_thr: float = 0.3,
                         teacher_max_per_img: int = 100,
                         ctr_clamp: float = 32.0) -> Dict[str, jnp.ndarray]:
    """Detection + distill losses for one batch (jit-friendly)."""
    gt_bboxes, gt_labels, gt_valid = (batch.gt_bboxes, batch.gt_labels,
                                      batch.gt_valid)
    tdet = None
    if teacher_out is not None:
        tdet, teacher_out = yolof_teacher_out(
            teacher_out, anchors, batch.img_hw, teacher_score_thr,
            teacher_max_per_img)
        if distill_cfg.hard:
            gt_bboxes = jnp.concatenate([tdet["bboxes"], gt_bboxes], axis=1)
            gt_labels = jnp.concatenate(
                [tdet["labels"].astype(gt_labels.dtype), gt_labels], axis=1)
            gt_valid = jnp.concatenate([tdet["valid"], gt_valid], axis=1)

    losses, _ = yolof_detection_loss(out.head, anchors, gt_bboxes,
                                     gt_labels, gt_valid, det_cfg)

    if tdet is not None:
        B = out.head.cls_scores.shape[0]
        C = det_cfg.num_classes
        n_pos = anchors.shape[0]
        num_keep = jnp.maximum(tdet["valid"].sum().astype(jnp.float32), 1.0)
        keep_w = jnp.zeros((B, n_pos), jnp.float32).at[
            jnp.arange(B)[:, None], tdet["keep_qid"]].max(
            tdet["valid"].astype(jnp.float32))

        if distill_cfg.soft:
            losses["loss_kd"] = distill_cfg.kd_weight * L.kd_kl_div_loss(
                out.head.cls_scores.reshape(-1, C),
                teacher_out.head.cls_scores.reshape(-1, C),
                weight=keep_w.reshape(-1, 1), avg_factor=num_keep,
                T=distill_cfg.kd_T)

        if distill_cfg.ld_bbox:
            from ..core.anchors import delta2bbox
            s_boxes = delta2bbox(anchors[None],
                                 out.head.bbox_preds.reshape(B, -1, 4),
                                 add_ctr_clamp=True, ctr_clamp=ctr_clamp)
            t_boxes = delta2bbox(anchors[None],
                                 teacher_out.head.bbox_preds.reshape(B, -1, 4),
                                 add_ctr_clamp=True, ctr_clamp=ctr_clamp)
            losses["loss_ld_bbox"] = (distill_cfg.ld_bbox_weight
                                      * L.smooth_l1_loss(
                s_boxes.reshape(-1, 4), t_boxes.reshape(-1, 4),
                weight=keep_w.reshape(-1, 1), avg_factor=num_keep))

        if distill_cfg.feats_kldv:
            from ..distill.losses import _kd_kl_axis
            kl = _kd_kl_axis(out.neck_feat, teacher_out.neck_feat,
                             distill_cfg.fd_T, axis=-1)
            losses["loss_fd"] = distill_cfg.fd_weight * kl.sum() / B

    return losses


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return YOLOF(num_classes=m.num_classes, depth=m.depth,
                     frozen_stages=m.frozen_stages)

    def losses(model, cfg, *, has_teacher=False, **_):
        from .yolof_head import YOLOFLossConfig, yolof_anchors
        det_cfg = YOLOFLossConfig(num_classes=cfg.model.num_classes)
        distill_cfg = YOLOFDistillConfig.from_flags(
            cates_distill=cfg.distill.cates_distill,
            locat_distill=cfg.distill.locat_distill,
            feats_distill=cfg.distill.feats_distill) if has_teacher else None

        def losses_fn(variables, batch, teacher_vars, rng):
            # train-mode apply: BN uses batch statistics and UPDATES the
            # running stats (the reference trains these BNs —
            # necks/dilated_encoder.py:108 norm requires_grad=True); the
            # frozen teacher keeps its running stats (deterministic=True).
            out, mutated = model.apply(
                variables, batch.images, batch.img_hw, deterministic=False,
                mutable=["batch_stats"])
            anchors = yolof_anchors(out.head.feat_hw)
            t_out = None
            if teacher_vars is not None:
                t_out = model.apply(teacher_vars, batch.images,
                                    batch.img_hw, deterministic=True)
            losses = yolof_compute_losses(
                out, anchors, batch, det_cfg, teacher_out=t_out,
                distill_cfg=distill_cfg,
                teacher_score_thr=cfg.distill.teacher_score_thr,
                teacher_max_per_img=cfg.distill.teacher_max_per_img)
            return losses, mutated["batch_stats"]
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det
        from .yolof_head import yolof_anchors, yolof_get_bboxes

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            d = yolof_get_bboxes(out.head, yolof_anchors(out.head.feat_hw),
                                 img_hw, scale_factor=scale_factors,
                                 score_thr=max(score_thr, 0.05),
                                 max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("yolof", build=build, losses=losses,
                    eval_step=eval_step)


_register()

"""YOLOY detector (parity: mmdet/models/detectors/yoloy.py — the fork's
YOLOX-style incremental detector: ResNet-18 backbone with trainable BN,
YOLOYPAFPN, YOLOYHead; teacher protocol with hard label merge done in the
DETECTOR (yoloy.py:147-152) and soft/ld/kldv distills in the head loss)."""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from .resnet import ResNet
from .yoloy_head import (YOLOYHead, YOLOYHeadOutputs, YOLOYLossConfig,
                         yoloy_detection_loss, yoloy_get_bboxes)
from .yoloy_pafpn import YOLOYPAFPN


class YOLOYOutputs(NamedTuple):
    head: YOLOYHeadOutputs
    neck_feats: Tuple[jnp.ndarray, ...]


class YOLOY(nn.Module):
    num_classes: int = 80
    depth: int = 18
    frozen_stages: int = 1
    neck_channels: int = 128

    @nn.compact
    def __call__(self, images: jnp.ndarray, img_hw: jnp.ndarray,
                 deterministic: bool = True) -> YOLOYOutputs:
        train = not deterministic
        feats = ResNet(depth=self.depth, out_indices=(1, 2, 3),
                       frozen_stages=self.frozen_stages,
                       name="backbone")(images)
        neck = YOLOYPAFPN(out_channels=self.neck_channels,
                          name="neck")(feats, train=train)
        head = YOLOYHead(num_classes=self.num_classes,
                         in_channels=self.neck_channels,
                         feat_channels=self.neck_channels,
                         name="bbox_head")(neck, train=train)
        return YOLOYOutputs(head, neck)


class YOLOYDistillConfig(NamedTuple):
    hard: bool = True
    soft: bool = False
    feats_kldv: bool = False
    kd_weight: float = 1.0
    kd_T: float = 2.0
    fd_weight: float = 1.0
    fd_T: float = 2.0

    @classmethod
    def from_flags(cls, cates_distill="", locat_distill="",
                   feats_distill="", **kw):
        return cls(hard="hard" in cates_distill,
                   soft="soft" in cates_distill,
                   feats_kldv="kldv" in feats_distill, **kw)


def yoloy_compute_losses(out: YOLOYOutputs, batch,
                         det_cfg: YOLOYLossConfig,
                         teacher_out: Optional[YOLOYOutputs] = None,
                         distill_cfg: Optional[YOLOYDistillConfig] = None,
                         teacher_score_thr: float = 0.3,
                         teacher_max_per_img: int = 100
                         ) -> Dict[str, jnp.ndarray]:
    gt_bboxes, gt_labels, gt_valid = (batch.gt_bboxes, batch.gt_labels,
                                      batch.gt_valid)
    tdet = None
    if teacher_out is not None:
        stop = jax.lax.stop_gradient
        teacher_out = jax.tree.map(stop, teacher_out)
        tdet = yoloy_get_bboxes(teacher_out.head, batch.img_hw,
                                strides=det_cfg.strides,
                                score_thr=teacher_score_thr,
                                max_per_img=teacher_max_per_img)
        if distill_cfg.hard:
            gt_bboxes = jnp.concatenate([tdet["bboxes"], gt_bboxes], 1)
            gt_labels = jnp.concatenate(
                [tdet["labels"].astype(gt_labels.dtype), gt_labels], 1)
            gt_valid = jnp.concatenate([tdet["valid"], gt_valid], 1)

    losses = yoloy_detection_loss(out.head, gt_bboxes, gt_labels, gt_valid,
                                  det_cfg)

    if tdet is not None:
        B = out.head.cls_scores[0].shape[0]
        C = det_cfg.num_classes
        cls_s = jnp.concatenate(
            [c.reshape(B, -1, C) for c in out.head.cls_scores], 1)
        cls_t = jnp.concatenate(
            [c.reshape(B, -1, C) for c in teacher_out.head.cls_scores], 1)
        n_pos = cls_s.shape[1]
        num_keep = jnp.maximum(tdet["valid"].sum().astype(jnp.float32), 1.0)
        keep_w = jnp.zeros((B, n_pos), jnp.float32).at[
            jnp.arange(B)[:, None], tdet["keep_qid"]].max(
            tdet["valid"].astype(jnp.float32))
        if distill_cfg.soft:
            losses["loss_kd"] = distill_cfg.kd_weight * L.kd_kl_div_loss(
                cls_s.reshape(-1, C), cls_t.reshape(-1, C),
                weight=keep_w.reshape(-1, 1), avg_factor=num_keep,
                T=distill_cfg.kd_T)
        if distill_cfg.feats_kldv:
            from ..distill.losses import _kd_kl_axis
            total = 0.0
            for sf, tf in zip(out.neck_feats, teacher_out.neck_feats):
                total = total + _kd_kl_axis(sf, tf, distill_cfg.fd_T,
                                            axis=-1).sum()
            losses["loss_fd"] = distill_cfg.fd_weight * total / B
    return losses


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return YOLOY(num_classes=m.num_classes, depth=m.depth,
                     frozen_stages=m.frozen_stages)

    def losses(model, cfg, *, has_teacher=False, **_):
        det_cfg = YOLOYLossConfig(num_classes=cfg.model.num_classes)
        distill_cfg = YOLOYDistillConfig.from_flags(
            cates_distill=cfg.distill.cates_distill,
            feats_distill=cfg.distill.feats_distill) if has_teacher else None

        def losses_fn(variables, batch, teacher_vars, rng):
            out, mutated = model.apply(
                variables, batch.images, batch.img_hw, deterministic=False,
                mutable=["batch_stats"])
            t_out = None
            if teacher_vars is not None:
                t_out = model.apply(teacher_vars, batch.images,
                                    batch.img_hw, deterministic=True)
            losses = yoloy_compute_losses(
                out, batch, det_cfg, teacher_out=t_out,
                distill_cfg=distill_cfg,
                teacher_score_thr=cfg.distill.teacher_score_thr,
                teacher_max_per_img=cfg.distill.teacher_max_per_img)
            return losses, mutated["batch_stats"]
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det
        from .yoloy_head import yoloy_get_bboxes

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            d = yoloy_get_bboxes(out.head, img_hw,
                                 scale_factor=scale_factors,
                                 score_thr=max(score_thr, 0.01),
                                 max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("yoloy", build=build, losses=losses,
                    eval_step=eval_step)


_register()

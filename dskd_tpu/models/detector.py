"""Detector assembly: backbone -> neck -> head (single-stage DETR family).

Parity target: mmdet/models/detectors/deformable_detr_il.py (extract_feat
:185-191, forward_train :255-319) — but teacher handling is TPU-native: the
frozen teacher is just a second parameter pytree passed through the same
apply function (no ``__setattr__`` parameter-hiding tricks are needed in a
functional framework; see dskd_tpu/distill/teacher.py).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .channel_mapper import ChannelMapper
from .gfl_detr_head import GFLDeformableDETRHead, HeadOutputs
from .resnet import ResNet


class DetectorOutputs(NamedTuple):
    head: HeadOutputs
    neck_feats: Tuple[jnp.ndarray, ...]   # NHWC per level


class GFLDeformableDETR(nn.Module):
    """ResNet-50 + ChannelMapper + GFL-Deformable-DETR head (the flagship)."""
    num_classes: int = 80
    num_query: int = 300
    reg_max: int = 16
    depth: int = 50
    frozen_stages: int = 1
    embed_dims: int = 256
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_levels: int = 4
    dropout: float = 0.1
    # per-stage DCN (reference dcn config variants)
    dcn_stages: tuple = (False, False, False, False)
    # rematerialize encoder/decoder layers on the backward pass; turn OFF for
    # forward-only applies (the frozen teacher) — remat wraps cost the
    # scheduler fusion freedom even without a backward
    remat: bool = True

    @nn.compact
    def __call__(self, images: jnp.ndarray, img_hw: jnp.ndarray,
                 deterministic: bool = True) -> DetectorOutputs:
        """images: (B, H, W, 3) normalized NHWC; img_hw: (B, 2) valid (h, w)."""
        batch_input_shape = (images.shape[1], images.shape[2])
        feats = ResNet(depth=self.depth, out_indices=(1, 2, 3),
                       frozen_stages=self.frozen_stages,
                       dcn_stages=self.dcn_stages,
                       name="backbone")(images)
        neck_feats = ChannelMapper(out_channels=self.embed_dims,
                                   num_outs=self.num_levels,
                                   name="neck")(feats)
        head_out = GFLDeformableDETRHead(
            num_classes=self.num_classes, num_query=self.num_query,
            embed_dims=self.embed_dims, reg_max=self.reg_max,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            num_levels=self.num_levels, dropout=self.dropout,
            remat=self.remat,
            name="bbox_head")(neck_feats, img_hw, batch_input_shape,
                              deterministic=deterministic)
        return DetectorOutputs(head_out, neck_feats)


# --- family registration (dskd_tpu/registry.py) -------------------------
# The DSKD flagship registers a full train_step (not a losses_fn): its
# step owns buffer donation + the teacher-outside-vjp layout
# (train/step.py make_train_step), which the generic family step wrapper
# does not provide.

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return GFLDeformableDETR(
            num_classes=m.num_classes, num_query=m.num_query,
            reg_max=m.reg_max, depth=m.depth,
            frozen_stages=m.frozen_stages, embed_dims=m.embed_dims,
            num_encoder_layers=m.num_encoder_layers,
            num_decoder_layers=m.num_decoder_layers,
            num_levels=m.num_levels, dropout=m.dropout,
            dcn_stages=tuple(m.dcn_stages), remat=m.remat)

    def train_step(model, cfg, *, num_prev, has_teacher, use_dropout,
                   compute_dtype, **_):
        from ..distill.losses import DistillConfig
        from ..train.step import make_train_step
        from .gfl_detr_loss import DetLossConfig
        det_cfg = DetLossConfig(num_classes=cfg.model.num_classes,
                                reg_max=cfg.model.reg_max)
        distill_cfg = None
        if has_teacher:
            distill_cfg = DistillConfig.from_flags(
                cates_distill=cfg.distill.cates_distill,
                locat_distill=cfg.distill.locat_distill,
                feats_distill=cfg.distill.feats_distill,
                memory_distill=cfg.distill.memory_distill,
                num_prev=max(num_prev, 1), reg_max=cfg.model.reg_max,
                fix_fg_grad_direction=cfg.distill.fix_fg_grad_direction)
        return make_train_step(
            model, det_cfg, distill_cfg,
            teacher_score_thr=cfg.distill.teacher_score_thr,
            teacher_max_per_img=cfg.distill.teacher_max_per_img,
            use_dropout=use_dropout, compute_dtype=compute_dtype)

    def eval_step(model, *, score_thr, max_per_img, reg_max, **_):
        import jax

        from .gfl_detr_head import get_bboxes

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            return get_bboxes(out.head.cls_scores[-1],
                              out.head.bbox_preds[-1], img_hw,
                              scale_factor=scale_factors, reg_max=reg_max,
                              score_thr=score_thr, max_per_img=max_per_img,
                              rescale=True)
        return step

    for name in ("gfl_deformable_detr", "deformable_detr_il"):
        register_family(name, build=build, train_step=train_step,
                        eval_step=eval_step)


_register()

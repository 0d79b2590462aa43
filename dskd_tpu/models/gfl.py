"""GFL detector assembly (parity: the gfl_r50_fpn_1x_coco baseline,
configs/gfl/metafile: box AP 40.2 @ 8xV100)."""
from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .fpn import FPN
from .gfl_head import GFLHead, GFLHeadOutputs
from .resnet import ResNet


class GFLOutputs(NamedTuple):
    head: GFLHeadOutputs
    neck_feats: Tuple[jnp.ndarray, ...]


class GFL(nn.Module):
    """ResNet + FPN (P3-P7) + GFL head."""
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = 1
    reg_max: int = 16

    @nn.compact
    def __call__(self, images: jnp.ndarray, img_hw: jnp.ndarray,
                 deterministic: bool = True) -> GFLOutputs:
        feats = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                       frozen_stages=self.frozen_stages,
                       name="backbone")(images)
        neck = FPN(out_channels=256, num_outs=5, start_level=1,
                   name="neck")(feats)
        head = GFLHead(num_classes=self.num_classes, reg_max=self.reg_max,
                       num_levels=5, name="bbox_head")(neck)
        return GFLOutputs(head, neck)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return GFL(num_classes=m.num_classes, depth=m.depth,
                   frozen_stages=m.frozen_stages, reg_max=m.reg_max)

    def losses(model, cfg, **_):
        from .gfl_head import GFLLossConfig, gfl_detection_loss
        det_cfg = GFLLossConfig(num_classes=cfg.model.num_classes,
                                reg_max=cfg.model.reg_max)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            return gfl_detection_loss(out.head, batch.gt_bboxes,
                                      batch.gt_labels, batch.gt_valid,
                                      det_cfg), None
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, reg_max, **_):
        import jax

        from ..utils.det import Det
        from .gfl_head import gfl_get_bboxes

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            d = gfl_get_bboxes(out.head, img_hw, scale_factor=scale_factors,
                               reg_max=reg_max,
                               score_thr=max(score_thr, 0.05),
                               max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("gfl", build=build, losses=losses,
                    eval_step=eval_step)
    _GFL_EVAL_STEP[0] = eval_step


# the LD family (models/ld.py) shares GFL's decode path
_GFL_EVAL_STEP = [None]

_register()

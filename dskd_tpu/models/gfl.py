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

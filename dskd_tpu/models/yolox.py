"""YOLOX detector (parity: mmdet/models/detectors/yolox.py +
configs/yolox/yolox_s_8x8_300e_coco.py, YOLOX-s box AP 40.5): the
anchor-free decoupled-head YOLO with SimOTA assignment — CSPDarknet
(deepen 0.33 / widen 0.5 for -s), YOLOXPAFPN, YOLOXHead with
IoU(mode='square') box loss, obj/cls BCE, and an L1 branch enabled for
the final no-augmentation epochs (YOLOXModeSwitchHook semantics — the
driver swaps in a use_l1 train step when Mosaic/MixUp turn off).

The fork's YOLOY family (models/yoloy.py) is this architecture with a
ResNet-18 trunk plus the incremental teacher protocol; YOLOX here is the
upstream non-IL variant. Multi-scale "random resize every 10 iters"
(detectors/yolox.py:249 _random_resize) is expressed TPU-natively as the
data pipeline's multi-scale + aspect-bucket canvases (static shapes per
bucket) rather than an in-graph dynamic resize.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .csp_darknet import CSPDarknet
from .yoloy import YOLOYOutputs
from .yoloy_head import YOLOYHead
from .yoloy_pafpn import YOLOYPAFPN


class YOLOX(nn.Module):
    num_classes: int = 80
    deepen_factor: float = 0.33
    widen_factor: float = 0.5
    neck_channels: int = 128
    frozen_stages: int = -1

    @nn.compact
    def __call__(self, images: jnp.ndarray, img_hw: jnp.ndarray,
                 deterministic: bool = True) -> YOLOYOutputs:
        train = not deterministic
        feats = CSPDarknet(deepen_factor=self.deepen_factor,
                           widen_factor=self.widen_factor,
                           out_indices=(2, 3, 4),
                           frozen_stages=self.frozen_stages,
                           name="backbone")(images, train=train)
        neck = YOLOYPAFPN(out_channels=self.neck_channels,
                          name="neck")(feats, train=train)
        head = YOLOYHead(num_classes=self.num_classes,
                         in_channels=self.neck_channels,
                         feat_channels=self.neck_channels,
                         name="bbox_head")(neck, train=train)
        return YOLOYOutputs(head, neck)

"""Res2Net backbone (parity: mmdet/models/backbones/res2net.py).

Bottle2neck: the bottleneck's single 3x3 conv becomes a hierarchy of
``scales`` width-sliced 3x3 convs with cascading adds (multi-scale
receptive fields inside one block); stage-type blocks (stride > 1) skip
the cascade add and average-pool the last slice. res2net50 layout:
scales=4, base_width=26.

The Res2Net trunk is a ResNet-D: deep 3-conv stem and avg-down shortcut
(reference res2net.py:307-317 forces deep_stem=True, avg_down=True —
AvgPool2d(stride) before a stride-1 1x1 projection, resnet.py:196-207).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from .resnet import ARCH_SETTINGS, FrozenBatchNorm


class Bottle2neck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    scales: int = 4
    base_width: int = 26

    @nn.compact
    def __call__(self, x):
        identity = x
        width = int(self.planes * self.base_width / 64)
        out = nn.Conv(width * self.scales, (1, 1), use_bias=False,
                      name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(name="bn1")(out))

        is_stage = self.downsample           # first block of a stage
        spx = jnp.split(out, self.scales, axis=-1)
        sp = None
        pieces = []
        for i in range(self.scales - 1):
            inp = spx[i] if (is_stage or sp is None) else sp + spx[i]
            sp = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                         padding=[(1, 1), (1, 1)], use_bias=False,
                         name=f"conv2_{i}")(inp)
            sp = nn.relu(FrozenBatchNorm(name=f"bn2_{i}")(sp))
            pieces.append(sp)
        last = spx[-1]
        if is_stage and self.stride != 1:
            last = nn.avg_pool(last, (3, 3),
                               strides=(self.stride, self.stride),
                               padding=((1, 1), (1, 1)))
        pieces.append(last)
        out = jnp.concatenate(pieces, axis=-1)

        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      name="conv3")(out)
        out = FrozenBatchNorm(name="bn3")(out)
        if self.downsample:
            # avg_down shortcut: AvgPool(stride) + 1x1 conv stride 1
            if self.stride > 1:
                identity = nn.avg_pool(
                    identity, (self.stride, self.stride),
                    strides=(self.stride, self.stride))
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               use_bias=False,
                               name="downsample_conv")(identity)
            identity = FrozenBatchNorm(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Res2Net(nn.Module):
    """Same stage plan as ResNet-50/101 with Bottle2neck blocks."""
    depth: int = 50
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = 1
    scales: int = 4
    base_width: int = 26

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        kind, stage_blocks = ARCH_SETTINGS[self.depth]
        assert kind == "bottleneck", "res2net needs a bottleneck depth"
        # deep stem: 32/2 -> 32 -> 64 (ResNet-D)
        out = x
        for i, (ch, s) in enumerate(((32, 2), (32, 1), (64, 1))):
            out = nn.Conv(ch, (3, 3), strides=(s, s),
                          padding=[(1, 1), (1, 1)], use_bias=False,
                          name=f"stem_conv{i}")(out)
            out = nn.relu(FrozenBatchNorm(name=f"stem_bn{i}")(out))
        if self.frozen_stages >= 0:
            out = lax.stop_gradient(out)
        out = nn.max_pool(out, (3, 3), strides=(2, 2),
                          padding=((1, 1), (1, 1)))

        outs = []
        for i, n in enumerate(stage_blocks):
            planes = 64 * 2 ** i
            stride = 1 if i == 0 else 2
            for b in range(n):
                out = Bottle2neck(planes=planes,
                                  stride=stride if b == 0 else 1,
                                  downsample=(b == 0),
                                  scales=self.scales,
                                  base_width=self.base_width,
                                  name=f"layer{i + 1}_block{b}")(out)
            if self.frozen_stages >= i + 1:
                out = lax.stop_gradient(out)
            if i in self.out_indices:
                outs.append(out)
        return tuple(outs)

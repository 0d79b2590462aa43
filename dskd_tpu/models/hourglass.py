"""Stacked Hourglass backbone (parity: mmdet/models/backbones/
hourglass.py:222 — HourglassNet-104, the canonical CornerNet backbone).

Stem (7x7/2 + stride-2 residual) to stride 4, then ``num_stacks``
recursive hourglass modules: each level runs a residual chain at the
current resolution (skip), downsamples into the next level, and adds the
nearest-upsampled result back. Stage channels (256, 256, 384, 384, 384,
512) with (2, 2, 2, 2, 2, 4) blocks. Between stacks the reference's
1x1-remap + residual inter connection. Outputs one stride-4 feature per
stack.

Unlike the detection ResNets (norm_eval), CornerNet TRAINS its BN —
flax nn.BatchNorm with running stats in 'batch_stats', updated when
``deterministic=False`` (the family step applies with
mutable=['batch_stats'], same pattern as YOLOF)."""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

STAGE_CHANNELS = (256, 256, 384, 384, 384, 512)
STAGE_BLOCKS = (2, 2, 2, 2, 2, 4)


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = self.kernel // 2
        y = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)], use_bias=False,
                    name="conv")(x)
        y = nn.BatchNorm(use_running_average=deterministic,
                         momentum=0.9, epsilon=1e-5, name="bn")(y)
        return nn.relu(y) if self.relu else y


class HGBasicBlock(nn.Module):
    """Hourglass residual block (expansion-1 basic block, trainable BN)."""
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        idn = x
        y = ConvBN(self.planes, 3, self.stride, name="conv1")(
            x, deterministic)
        y = ConvBN(self.planes, 3, 1, relu=False, name="conv2")(
            y, deterministic)
        if self.stride != 1 or x.shape[-1] != self.planes:
            idn = ConvBN(self.planes, 1, self.stride, relu=False,
                         name="downsample")(x, deterministic)
        return nn.relu(y + idn)


class ResChain(nn.Module):
    """mmdet ResLayer: ``downsample_first`` places the channel-changing
    (and strided) block first (default) or LAST (the reference's low3
    chains, hourglass.py ResLayer(downsample_first=False))."""
    planes: int
    blocks: int
    stride: int = 1
    downsample_first: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for b in range(self.blocks):
            if self.downsample_first:
                planes = self.planes
                stride = self.stride if b == 0 else 1
            else:
                last = b == self.blocks - 1
                planes = self.planes if last else x.shape[-1]
                stride = self.stride if last else 1
            x = HGBasicBlock(planes, stride=stride,
                             name=f"block{b}")(x, deterministic)
        return x


def _nearest_up2(x):
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


class HourglassModule(nn.Module):
    depth: int = 5

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = self.depth
        cur_c, next_c = STAGE_CHANNELS[5 - d], STAGE_CHANNELS[6 - d]
        cur_b, next_b = STAGE_BLOCKS[5 - d], STAGE_BLOCKS[6 - d]
        up1 = ResChain(cur_c, cur_b, name="up1")(x, deterministic)
        # degenerate tiny inputs (CI-size canvases) can't halve further:
        # stop the down-up branch; real 511x511 training never hits this
        if min(x.shape[1], x.shape[2]) < 4 \
                or x.shape[1] % 2 or x.shape[2] % 2:
            return up1
        low1 = ResChain(next_c, cur_b, stride=2, name="low1")(
            x, deterministic)
        if d > 1:
            low2 = HourglassModule(d - 1, name="low2")(low1, deterministic)
        else:
            low2 = ResChain(next_c, next_b, name="low2")(
                low1, deterministic)
        low3 = ResChain(cur_c, cur_b, downsample_first=False,
                        name="low3")(low2, deterministic)
        return up1 + _nearest_up2(low3)


class HourglassNet(nn.Module):
    num_stacks: int = 2
    feat_channels: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, ...]:
        inter = ConvBN(128, 7, 2, name="stem_conv")(x, deterministic)
        inter = ResChain(256, 1, stride=2, name="stem_res")(
            inter, deterministic)

        feats = []
        for i in range(self.num_stacks):
            hg = HourglassModule(5, name=f"hg{i}")(inter, deterministic)
            out = ConvBN(self.feat_channels, 3, name=f"out_conv{i}")(
                hg, deterministic)
            feats.append(out)
            if i < self.num_stacks - 1:
                a = ConvBN(256, 1, relu=False, name=f"inter_remap{i}")(
                    inter, deterministic)
                b = ConvBN(256, 1, relu=False, name=f"out_remap{i}")(
                    out, deterministic)
                inter = ResChain(256, 1, name=f"inter_res{i}")(
                    nn.relu(a + b), deterministic)
        return tuple(feats)

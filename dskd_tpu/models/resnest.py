"""ResNeSt backbone (parity: mmdet/models/backbones/resnest.py:322).

ResNet-D trunk (deep 3-conv stem, average-pool downsampling) whose
bottleneck 3x3 is a Split-Attention convolution: the conv emits
radix * width channels, the radix splits are summed, globally pooled,
squeezed through an inter-channel MLP and re-weighted by an rSoftMax over
the radix axis (softmax across splits per channel group).

NHWC, frozen BN running stats (norm_eval) like the other detection
ResNets. radix=2, groups=1, base width 64 — the resnest50 layout.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import FrozenBatchNorm

DEPTHS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class SplitAttentionConv(nn.Module):
    channels: int          # output width per split
    radix: int = 2
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        r, c = self.radix, self.channels
        # the reference's SplAtConv2d groups the conv by groups*radix
        y = nn.Conv(c * r, (3, 3), padding=[(1, 1), (1, 1)],
                    feature_group_count=r, use_bias=False, name="conv")(x)
        y = nn.relu(FrozenBatchNorm(name="bn0")(y))
        B, H, W, _ = y.shape
        splits = y.reshape(B, H, W, r, c)
        gap = splits.sum(axis=3).mean(axis=(1, 2))          # (B, c)
        inter = max(c * r // self.reduction, 32)
        a = nn.Dense(inter, name="fc1")(gap)
        a = nn.relu(FrozenBatchNorm(name="bn1")(a[:, None, None, :])
                    )[:, 0, 0, :]
        a = nn.Dense(c * r, name="fc2")(a).reshape(B, r, c)
        att = jax.nn.softmax(a, axis=1)                     # rSoftMax
        return (splits * att[:, None, None, :, :]).sum(axis=3)


class ResNeStBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    radix: int = 2

    @nn.compact
    def __call__(self, x):
        idn = x
        w = self.planes
        y = nn.Conv(w, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(FrozenBatchNorm(name="bn1")(y))
        if self.stride > 1:
            # ResNeSt-D places the stride as an avg pool AROUND the SplAt
            y = nn.avg_pool(y, (3, 3), strides=(self.stride, self.stride),
                            padding=((1, 1), (1, 1)))
        y = SplitAttentionConv(w, radix=self.radix, name="conv2")(y)
        y = nn.Conv(4 * w, (1, 1), use_bias=False, name="conv3")(y)
        y = FrozenBatchNorm(name="bn3")(y)
        if self.downsample:
            if self.stride > 1:   # avg_down trunk
                idn = nn.avg_pool(idn, (self.stride, self.stride),
                                  strides=(self.stride, self.stride))
            idn = nn.Conv(4 * w, (1, 1), use_bias=False,
                          name="downsample_conv")(idn)
            idn = FrozenBatchNorm(name="downsample_bn")(idn)
        return nn.relu(y + idn)


class ResNeSt(nn.Module):
    depth: int = 50
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = 1
    radix: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        # deep stem: 32/2 -> 32 -> 64, then 3x3/2 maxpool
        y = x
        for i, (ch, s) in enumerate(((32, 2), (32, 1), (64, 1))):
            y = nn.Conv(ch, (3, 3), strides=(s, s),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        name=f"stem_conv{i}")(y)
            y = nn.relu(FrozenBatchNorm(name=f"stem_bn{i}")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        if self.frozen_stages >= 0:
            y = jax.lax.stop_gradient(y)

        outs = []
        for s, n_blocks in enumerate(DEPTHS[self.depth]):
            planes = 64 * 2 ** s
            for b in range(n_blocks):
                y = ResNeStBottleneck(
                    planes, stride=2 if (b == 0 and s > 0) else 1,
                    downsample=(b == 0), radix=self.radix,
                    name=f"layer{s + 1}_block{b}")(y)
            if s + 1 <= self.frozen_stages:
                y = jax.lax.stop_gradient(y)
            if s in self.out_indices:
                outs.append(y)
        return tuple(outs)

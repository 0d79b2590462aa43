"""YOLOF DilatedEncoder neck (parity: mmdet/models/necks/dilated_encoder.py).

C5 (2048) -> lateral 1x1 conv + BN -> fpn 3x3 conv + BN -> 4 dilated
residual bottlenecks (dilations 2, 4, 6, 8), all channels 512 with 128
mid-channels. BatchNorm here is trainable (the reference's norm_cfg
requires_grad=True) — stats update through the 'batch_stats' collection.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class TrainableBatchNorm(nn.Module):
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train,
                            momentum=self.momentum, epsilon=self.epsilon,
                            name="bn")(x)


class Bottleneck(nn.Module):
    mid_channels: int = 128
    out_channels: int = 512
    dilation: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        d = self.dilation
        # init parity (dilated_encoder.py:99-101): block convs Normal(0.01)
        n01 = nn.initializers.normal(0.01)
        y = nn.Conv(self.mid_channels, (1, 1), kernel_init=n01,
                    use_bias=False, name="conv1")(x)
        y = nn.relu(TrainableBatchNorm(name="bn1")(y, train))
        y = nn.Conv(self.mid_channels, (3, 3),
                    kernel_dilation=(d, d), padding=[(d, d), (d, d)],
                    kernel_init=n01, use_bias=False, name="conv2")(y)
        y = nn.relu(TrainableBatchNorm(name="bn2")(y, train))
        y = nn.Conv(self.out_channels, (1, 1), kernel_init=n01,
                    use_bias=False, name="conv3")(y)
        y = nn.relu(TrainableBatchNorm(name="bn3")(y, train))
        return y + identity


class DilatedEncoder(nn.Module):
    out_channels: int = 512
    block_mid_channels: int = 128
    num_residual_blocks: int = 4
    block_dilations: Sequence[int] = (2, 4, 6, 8)

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray],
                 train: bool = False) -> Tuple[jnp.ndarray, ...]:
        x = inputs[-1]                          # C5 only
        # init parity (dilated_encoder.py:95-96): caffe2 Xavier =
        # uniform(+-sqrt(3/fan_in)) on lateral/fpn convs
        c2x = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")
        x = nn.Conv(self.out_channels, (1, 1), kernel_init=c2x,
                    name="lateral_conv")(x)
        x = TrainableBatchNorm(name="lateral_norm")(x, train)
        x = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=c2x, name="fpn_conv")(x)
        x = TrainableBatchNorm(name="fpn_norm")(x, train)
        for i in range(self.num_residual_blocks):
            x = Bottleneck(self.block_mid_channels, self.out_channels,
                           self.block_dilations[i],
                           name=f"dilated_block{i}")(x, train)
        return (x,)

"""YOLOY PAFPN neck + CSP layer (parity: mmdet yolox_pafpn.py /
yoloy_pafpn.py fork clone + models/utils/csp_layer.py).

Top-down then bottom-up path aggregation with CSP blocks; Swish activations,
BN(momentum 0.03). YOLOY config: in_channels=[128, 256, 512] (ResNet-18
C3-C5), out_channels=128, num_csp_blocks=1.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .dilated_encoder import TrainableBatchNorm


def swish(x):
    return x * nn.sigmoid(x)


class ConvBNSwish(nn.Module):
    out_channels: int
    kernel: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    name="conv")(x)
        x = TrainableBatchNorm(momentum=0.97, name="bn")(x, train)
        return swish(x)


class DarknetBottleneck(nn.Module):
    out_channels: int
    expansion: float = 0.5
    add_identity: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_channels * self.expansion)
        y = ConvBNSwish(hidden, 1, name="conv1")(x, train)
        y = ConvBNSwish(self.out_channels, 3, name="conv2")(y, train)
        if self.add_identity and x.shape[-1] == self.out_channels:
            return x + y
        return y


class CSPLayer(nn.Module):
    out_channels: int
    num_blocks: int = 1
    expand_ratio: float = 0.5
    add_identity: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = int(self.out_channels * self.expand_ratio)
        main = ConvBNSwish(mid, 1, name="main_conv")(x, train)
        short = ConvBNSwish(mid, 1, name="short_conv")(x, train)
        for i in range(self.num_blocks):
            main = DarknetBottleneck(mid, 1.0, self.add_identity,
                                     name=f"block{i}")(main, train)
        out = jnp.concatenate([main, short], axis=-1)
        return ConvBNSwish(self.out_channels, 1, name="final_conv")(out,
                                                                    train)


def _upsample2x(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class YOLOYPAFPN(nn.Module):
    out_channels: int = 128
    num_csp_blocks: int = 1

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray],
                 train: bool = False) -> Tuple[jnp.ndarray, ...]:
        L = len(inputs)
        # reduce top levels before upsampling
        inners = list(inputs)
        for i in range(L - 1, 0, -1):
            inners[i] = ConvBNSwish(inners[i - 1].shape[-1], 1,
                                    name=f"reduce{i}")(inners[i], train)
            up = _upsample2x(inners[i])
            up = up[:, :inners[i - 1].shape[1], :inners[i - 1].shape[2]]
            merged = jnp.concatenate([up, inners[i - 1]], axis=-1)
            inners[i - 1] = CSPLayer(inners[i - 1].shape[-1],
                                     self.num_csp_blocks, add_identity=False,
                                     name=f"top_down{i}")(merged, train)

        outs = [inners[0]]
        for i in range(L - 1):
            down = ConvBNSwish(outs[-1].shape[-1], 3, stride=2,
                               name=f"down{i}")(outs[-1], train)
            merged = jnp.concatenate([down, inners[i + 1]], axis=-1)
            outs.append(CSPLayer(inners[i + 1].shape[-1],
                                 self.num_csp_blocks, add_identity=False,
                                 name=f"bottom_up{i}")(merged, train))

        return tuple(
            ConvBNSwish(self.out_channels, 1, name=f"out_conv{i}")(o, train)
            for i, o in enumerate(outs))

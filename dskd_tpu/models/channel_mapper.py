"""ChannelMapper neck (parity: mmdet/models/necks/channel_mapper.py).

DSKD config: in_channels=[512, 1024, 2048], kernel_size=1, out_channels=256,
GN(32), act=None, num_outs=4 — one 1x1 conv + GN per input level plus one
extra 3x3 stride-2 conv on the LAST INPUT (C5) for the additional level
(reference channel_mapper.py: extra convs consume ``inputs[-1]``).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class ChannelMapper(nn.Module):
    out_channels: int = 256
    kernel_size: int = 1
    num_outs: int = 4
    num_groups: int = 32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        outs = []
        k = self.kernel_size
        pad = (k - 1) // 2
        # init parity (channel_mapper.py:54-55): Xavier-uniform convs
        xav = nn.initializers.xavier_uniform()
        for i, x in enumerate(inputs):
            y = nn.Conv(self.out_channels, (k, k),
                        padding=[(pad, pad), (pad, pad)],
                        kernel_init=xav, name=f"conv{i}")(x)
            y = nn.GroupNorm(epsilon=1e-5, num_groups=self.num_groups, name=f"gn{i}")(y)
            outs.append(y)
        x = inputs[-1]
        for j in range(self.num_outs - len(inputs)):
            y = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], kernel_init=xav,
                        name=f"extra_conv{j}")(x)
            y = nn.GroupNorm(epsilon=1e-5, num_groups=self.num_groups, name=f"extra_gn{j}")(y)
            outs.append(y)
            x = y
        return tuple(outs)

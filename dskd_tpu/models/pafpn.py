"""PAFPN neck: FPN + bottom-up path aggregation.

Parity: mmdet/models/necks/pafpn.py:100-158 — FPN top-down laterals and
3x3 convs, then a stride-2 bottom-up pass (downsample_convs) whose sums
feed 3x3 pafpn_convs; level 0 passes through untouched; extra levels via
max-pool (default) or extra convs, exactly the FPN option space.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .fpn import _upsample_nearest_2x


class PAFPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    add_extra_convs: str = ""            # '', 'on_input', 'on_output'
    relu_before_extra_convs: bool = False

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]
                 ) -> Tuple[jnp.ndarray, ...]:
        # init parity (necks/pafpn.py:58-59): Xavier-uniform convs
        xav = nn.initializers.xavier_uniform()
        used = list(inputs[self.start_level:])
        laterals = [
            nn.Conv(self.out_channels, (1, 1), kernel_init=xav,
                    name=f"lateral{i}")(x)
            for i, x in enumerate(used)]

        n = len(laterals)
        for i in range(n - 1, 0, -1):
            up = _upsample_nearest_2x(laterals[i])
            up = up[:, :laterals[i - 1].shape[1],
                    :laterals[i - 1].shape[2]]
            laterals[i - 1] = laterals[i - 1] + up

        inter = [nn.Conv(self.out_channels, (3, 3), kernel_init=xav,
                         padding=[(1, 1), (1, 1)], name=f"fpn_conv{i}")(x)
                 for i, x in enumerate(laterals)]

        # bottom-up path aggregation (pafpn.py:119-121)
        for i in range(n - 1):
            down = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)], kernel_init=xav,
                           name=f"downsample_conv{i}")(inter[i])
            inter[i + 1] = inter[i + 1] + down[:, :inter[i + 1].shape[1],
                                               :inter[i + 1].shape[2]]

        outs = [inter[0]]
        outs += [nn.Conv(self.out_channels, (3, 3),
                         padding=[(1, 1), (1, 1)], kernel_init=xav,
                         name=f"pafpn_conv{i - 1}")(inter[i])
                 for i in range(1, n)]

        if self.num_outs > n:
            if not self.add_extra_convs:
                for _ in range(self.num_outs - n):
                    outs.append(nn.max_pool(outs[-1], (1, 1),
                                            strides=(2, 2)))
            else:
                src = used[-1] if self.add_extra_convs == "on_input" \
                    else outs[-1]
                for j in range(self.num_outs - n):
                    if j > 0 and self.relu_before_extra_convs:
                        src = nn.relu(src)
                    src = nn.Conv(self.out_channels, (3, 3),
                                  strides=(2, 2), padding=[(1, 1), (1, 1)],
                                  kernel_init=xav,
                                  name=f"extra_conv{j}")(src)
                    outs.append(src)
        return tuple(outs)

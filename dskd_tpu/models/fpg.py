"""FPG — Feature Pyramid Grids (parity: mmdet necks/fpg.py +
configs/fpg/retinanet_r50_fpg_crop640_50e_coco.py, +2.0 AP over FPN at
crop640; shipped recipe: 9 bottom-up stacks, conv same-up (k3 s2),
conv across-lateral (k1), interpolation-conv across-down, conv
across-skip from the stage-0 grid, last-conv output transition, all in
(act, conv, norm) pre-activation order, skip_inds staircase
((0,1,2,3), (0,1,2), (0,1), (0,), ())).

TPU note: the reference's transition norms are BN(requires_grad); here
GroupNorm(32) substitutes (batch-size independent, the framework's
standard TPU norm policy — same substitution as QueryInst's mask convs,
documented for converter users)."""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

SKIP_INDS = ((0, 1, 2, 3), (0, 1, 2), (0, 1), (0,), ())


class _Trans(nn.Module):
    """(act, conv, norm)-ordered transition; optional 2x nearest
    interpolation before the conv (type='interpolation_conv')."""
    channels: int = 256
    kernel: int = 3
    stride: int = 1
    interp: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.relu(x)
        if self.interp:
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        p = (self.kernel - 1) // 2
        x = nn.Conv(self.channels, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)], use_bias=False,
                    name="conv")(x)
        return nn.GroupNorm(num_groups=min(32, self.channels),
                            epsilon=1e-5, name="gn")(x)


class FPG(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 9
    skip_inds: Tuple[Tuple[int, ...], ...] = SKIP_INDS

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        feats = [nn.Conv(self.out_channels, (1, 1),
                         name=f"lateral{i}")(x)
                 for i, x in enumerate(inputs)]
        for e in range(self.num_outs - len(feats)):
            feats.append(nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                                 padding=[(1, 1), (1, 1)],
                                 name=f"extra_down{e}")(feats[-1]))
        stage0 = feats
        current = feats
        for i in range(self.stack_times):
            nxt = []
            for lvl in range(self.num_outs):           # bottom-up path
                if i in self.skip_inds[lvl]:
                    nxt.append(current[lvl])
                    continue
                parts = []
                if lvl > 0:                            # same_up (k3 s2)
                    parts.append(_Trans(self.out_channels, 3, 2,
                                        name=f"s{i}_l{lvl}_same_up")(
                        nxt[-1]))
                parts.append(_Trans(self.out_channels, 1,
                                    name=f"s{i}_l{lvl}_lateral")(
                    current[lvl]))
                if lvl < self.num_outs - 1:            # across_down
                    up = _Trans(self.out_channels, 3, interp=True,
                                name=f"s{i}_l{lvl}_across_down")(
                        current[lvl + 1])
                    h, w = current[lvl].shape[1:3]
                    parts.append(up[:, :h, :w])
                parts.append(_Trans(self.out_channels, 1,
                                    name=f"s{i}_l{lvl}_skip")(stage0[lvl]))
                nxt.append(sum(parts))
            current = nxt
        return tuple(
            _Trans(self.out_channels, 3, name=f"out{lvl}")(current[lvl])
            for lvl in range(self.num_outs))

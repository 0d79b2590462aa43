"""EfficientNet backbone (parity: mmdet/models/backbones/efficientnet.py:417).

MBConv inverted residuals with SE(0.25-of-input) and swish, compound-scaled
from the B0 arch table (width_mult on channels w/ divisor-8 rounding,
depth_mult on repeats w/ ceil). Detection taps the stride-8/16/32 stages:
``out_indices=(2, 4, 6)`` in this module's 0..6 stage numbering gives the
channels mmdet's retinanet_effb3 config consumes (48, 136, 384 for b3).

Stochastic depth (drop_path) follows the reference recipe: the rate
scales linearly 0 -> drop_path_rate over the block sequence
(efficientnet.py:335 torch.linspace) and drops whole residual branches
per sample at train time (retinanet_effb3 config sets 0.2).

Unlike the ResNet family recipes, retinanet_effb3_fpn_crop896 TRAINS the
backbone BNs (norm_eval=False, SyncBN eps=1e-3 momentum=0.01, and
frozen_stages=0 = nothing frozen) — ``norm_eval=False`` here runs
nn.BatchNorm in train mode when ``deterministic=False`` (ride the
sepbn mutable-batch_stats path); frozen_stages follows the mmdet
EfficientNet convention: 0 freezes nothing, 1 the stem, 1+k the stem
plus the first k stages.
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import FrozenBatchNorm

# B0 rows: (expand_ratio, out_channels, repeats, kernel, stride)
B0_ARCH = (
    (1, 16, 1, 3, 1),
    (6, 24, 2, 3, 2),
    (6, 40, 2, 5, 2),
    (6, 80, 3, 3, 2),
    (6, 112, 3, 5, 1),
    (6, 192, 4, 5, 2),
    (6, 320, 1, 3, 1),
)
# (width_mult, depth_mult)
SCALES = {"b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2),
          "b3": (1.2, 1.4), "b4": (1.4, 1.8), "b5": (1.6, 2.2)}


def round_filters(ch: float, width_mult: float, divisor: int = 8) -> int:
    ch = ch * width_mult
    new = max(divisor, int(ch + divisor / 2) // divisor * divisor)
    if new < 0.9 * ch:
        new += divisor
    return int(new)


def round_repeats(n: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * n))


def swish(x):
    return x * jax.nn.sigmoid(x)


def _eff_bn(name: str, norm_eval: bool, train: bool):
    """Reference BN recipe: eps=1e-3, torch momentum 0.01 (flax 0.99)."""
    if norm_eval:
        return FrozenBatchNorm(epsilon=1e-3, name=name)
    return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                        epsilon=1e-3, name=name)


class MBConv(nn.Module):
    out_ch: int
    expand_ratio: int
    kernel: int
    stride: int
    se_ratio: float = 0.25
    drop_path: float = 0.0
    norm_eval: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        bn = lambda n: _eff_bn(n, self.norm_eval, not deterministic)
        in_ch = x.shape[-1]
        mid = in_ch * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, name="expand_conv")(y)
            y = swish(bn("expand_bn")(y))
        k, s = self.kernel, self.stride
        p = k // 2
        y = nn.Conv(mid, (k, k), strides=(s, s),
                    padding=[(p, p), (p, p)], feature_group_count=mid,
                    use_bias=False, name="dw_conv")(y)
        y = swish(bn("dw_bn")(y))
        # SE: squeeze filters from the block INPUT channels
        se_ch = max(1, int(in_ch * self.se_ratio))
        sq = y.mean(axis=(1, 2), keepdims=True)
        sq = swish(nn.Conv(se_ch, (1, 1), name="se_reduce")(sq))
        sq = jax.nn.sigmoid(nn.Conv(mid, (1, 1), name="se_expand")(sq))
        y = y * sq
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                    name="project_conv")(y)
        y = _eff_bn("project_bn", self.norm_eval, not deterministic)(y)
        if self.stride == 1 and in_ch == self.out_ch:
            if self.drop_path > 0:
                # DropPath: drop the whole residual branch per sample,
                # rescaled by 1/keep_prob (mmcv DropPath semantics)
                y = nn.Dropout(rate=self.drop_path,
                               broadcast_dims=(1, 2, 3),
                               name="drop_path")(
                    y, deterministic=deterministic)
            y = y + x
        return y


class EfficientNet(nn.Module):
    arch: str = "b3"
    out_indices: Sequence[int] = (2, 4, 6)
    # mmdet convention: 0 = nothing frozen (the retinanet_effb3 recipe)
    frozen_stages: int = 0
    # retinanet_effb3_fpn_crop896 sets 0.2; linearly scaled over blocks
    drop_path_rate: float = 0.0
    # reference effb recipe trains BN (norm_eval=False)
    norm_eval: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, ...]:
        wm, dm = SCALES[self.arch]
        stem_ch = round_filters(32, wm)
        y = nn.Conv(stem_ch, (3, 3), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    name="stem_conv")(x)
        y = swish(_eff_bn("stem_bn", self.norm_eval,
                          not deterministic)(y))
        if self.frozen_stages >= 1:
            y = jax.lax.stop_gradient(y)

        outs = []
        total_blocks = sum(round_repeats(n, dm) for _, _, n, _, _ in B0_ARCH)
        bi = 0
        for si, (er, ch, n, k, s) in enumerate(B0_ARCH):
            out_ch = round_filters(ch, wm)
            for b in range(round_repeats(n, dm)):
                dpr = (self.drop_path_rate * bi / max(total_blocks - 1, 1)
                       if self.drop_path_rate > 0 else 0.0)
                y = MBConv(out_ch, er, k, s if b == 0 else 1,
                           drop_path=dpr, norm_eval=self.norm_eval,
                           name=f"stage{si}_block{b}")(
                    y, deterministic=deterministic)
                bi += 1
            if si + 2 <= self.frozen_stages:
                y = jax.lax.stop_gradient(y)
            if si in self.out_indices:
                outs.append(y)
        return tuple(outs)

    @staticmethod
    def stage_channels(arch: str,
                       out_indices=(2, 4, 6)) -> Tuple[int, ...]:
        wm, _ = SCALES[arch]
        return tuple(round_filters(B0_ARCH[i][1], wm) for i in out_indices)

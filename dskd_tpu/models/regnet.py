"""RegNetX backbone (parity: mmdet/models/backbones/regnet.py:356).

Design-space-generated ResNeXt-style network: per-block widths follow the
linear-log schedule (w_0, w_a, w_m, depth), quantized to multiples of 8 and
grouped into 4 stages; blocks are bottlenecks with expansion 1 and grouped
3x3 convs (group width from the schedule). Stem is a single 3x3/2 conv
(32ch) — unlike ResNet there is no maxpool, stage 1 downsamples.

TPU notes: NHWC, grouped convs via feature_group_count (XLA maps them onto
the MXU), frozen BN running stats in 'batch_stats' (norm_eval).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .resnet import FrozenBatchNorm

# mmdet arch table (regnet.py arch_parameter presets)
ARCHS = {
    "regnetx_400mf": dict(w0=24, wa=24.48, wm=2.54, group_w=16, depth=22),
    "regnetx_800mf": dict(w0=56, wa=35.73, wm=2.28, group_w=16, depth=16),
    "regnetx_1.6gf": dict(w0=80, wa=34.01, wm=2.25, group_w=24, depth=18),
    "regnetx_3.2gf": dict(w0=88, wa=26.31, wm=2.25, group_w=48, depth=25),
    "regnetx_4.0gf": dict(w0=96, wa=38.65, wm=2.43, group_w=40, depth=23),
    "regnetx_6.4gf": dict(w0=184, wa=60.83, wm=2.07, group_w=56, depth=17),
    "regnetx_8.0gf": dict(w0=80, wa=49.56, wm=2.88, group_w=120, depth=23),
    "regnetx_12gf": dict(w0=168, wa=73.36, wm=2.37, group_w=112, depth=19),
}


def generate_regnet(w0: float, wa: float, wm: float, depth: int,
                    q: int = 8) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    """Per-stage (widths, depths) from the linear-log parameterization
    (regnet.py generate_regnet + quantization)."""
    ws_cont = w0 + wa * np.arange(depth)
    ks = np.round(np.log(ws_cont / w0) / np.log(wm))
    ws = w0 * np.power(wm, ks)
    ws = np.round(ws / q) * q
    widths, depths = [], []
    for w in ws.astype(int):
        if not widths or w != widths[-1]:
            widths.append(int(w))
            depths.append(1)
        else:
            depths[-1] += 1
    assert len(widths) == 4, (widths, "RegNet schedule must give 4 stages")
    return tuple(widths), tuple(depths)


def adjust_width_group(widths, group_w):
    """Round widths divisible by their (possibly shrunk) group widths
    (regnet.py adjust_width_group, bottleneck_ratio=1)."""
    groups = [min(group_w, w) for w in widths]
    widths = [int(round(w / g) * g) for w, g in zip(widths, groups)]
    return tuple(widths), tuple(groups)


class RegNetBlock(nn.Module):
    """Bottleneck with expansion 1: 1x1 -> grouped 3x3 (stride) -> 1x1."""
    width: int
    group_width: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        groups = self.width // self.group_width
        idn = x
        y = nn.Conv(self.width, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(FrozenBatchNorm(name="bn1")(y))
        y = nn.Conv(self.width, (3, 3),
                    strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], feature_group_count=groups,
                    use_bias=False, name="conv2")(y)
        y = nn.relu(FrozenBatchNorm(name="bn2")(y))
        y = nn.Conv(self.width, (1, 1), use_bias=False, name="conv3")(y)
        y = FrozenBatchNorm(name="bn3")(y)
        if self.stride != 1 or x.shape[-1] != self.width:
            idn = nn.Conv(self.width, (1, 1),
                          strides=(self.stride, self.stride),
                          use_bias=False, name="downsample_conv")(x)
            idn = FrozenBatchNorm(name="downsample_bn")(idn)
        return nn.relu(y + idn)


class RegNet(nn.Module):
    arch: str = "regnetx_3.2gf"
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        import jax
        cfg = ARCHS[self.arch]
        widths, depths = generate_regnet(cfg["w0"], cfg["wa"], cfg["wm"],
                                         cfg["depth"])
        widths, groups = adjust_width_group(widths, cfg["group_w"])

        y = nn.Conv(32, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="stem_conv")(x)
        y = nn.relu(FrozenBatchNorm(name="stem_bn")(y))
        if self.frozen_stages >= 0:
            y = jax.lax.stop_gradient(y)

        outs = []
        for s, (w, d, g) in enumerate(zip(widths, depths, groups)):
            for b in range(d):
                y = RegNetBlock(w, g, stride=2 if b == 0 else 1,
                                name=f"layer{s + 1}_block{b}")(y)
            if s + 1 <= self.frozen_stages:
                y = jax.lax.stop_gradient(y)
            if s in self.out_indices:
                outs.append(y)
        return tuple(outs)

    @staticmethod
    def stage_widths(arch: str) -> Tuple[int, ...]:
        cfg = ARCHS[arch]
        widths, _ = generate_regnet(cfg["w0"], cfg["wa"], cfg["wm"],
                                    cfg["depth"])
        widths, _ = adjust_width_group(widths, cfg["group_w"])
        return widths

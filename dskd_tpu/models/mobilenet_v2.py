"""MobileNetV2 backbone (parity: mmdet/models/backbones/mobilenet_v2.py).

Inverted residual blocks with ReLU6, the standard 7-stage arch table
(expand_ratio, channels, num_blocks, stride), mmdet-style out_indices /
frozen_stages / width_factor. Same FrozenBatchNorm + stop_gradient freeze
semantics as the ResNet backbone (norm_eval recipe).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from .dilated_encoder import TrainableBatchNorm
from .resnet import FrozenBatchNorm

# (expand_ratio, out_channels, num_blocks, first_stride)
ARCH = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
        (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))


def make_divisible(v: float, divisor: int = 8) -> int:
    new = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new < 0.9 * v:
        new += divisor
    return new


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _act(x, act: str):
    """'relu6' (classification default) or 'leaky' (the yolov3-mbv2
    recipe's act_cfg LeakyReLU(0.1), configs/yolo/yolov3_mobilenetv2_*)."""
    return nn.leaky_relu(x, 0.1) if act == "leaky" else _relu6(x)


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int
    expand_ratio: int
    act: str = "relu6"
    train_bn: bool = False
    # scratch-recipe knobs (ssdlite: BN(eps=1e-3, momentum=0.03 torch ->
    # 0.97 flax) + TruncNormal(0.03) convs); None keeps the defaults
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    kernel_init: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def norm(y, name):
            if self.train_bn:
                return TrainableBatchNorm(
                    momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                    name=name)(y, train)
            return FrozenBatchNorm(name=name)(y)

        def nn_Conv(*a, **kw):
            if self.kernel_init is not None:
                kw.setdefault("kernel_init", self.kernel_init)
            return nn.Conv(*a, **kw)

        c_in = x.shape[-1]
        hidden = c_in * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = nn_Conv(hidden, (1, 1), use_bias=False, name="expand")(y)
            y = _act(norm(y, "expand_bn"), self.act)
        # depthwise 3x3
        y = nn_Conv(hidden, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], feature_group_count=hidden,
                    use_bias=False, name="depthwise")(y)
        y = _act(norm(y, "depthwise_bn"), self.act)
        y = nn_Conv(self.out_channels, (1, 1), use_bias=False,
                    name="project")(y)
        y = norm(y, "project_bn")
        if self.stride == 1 and c_in == self.out_channels:
            y = x + y
        return y


class MobileNetV2(nn.Module):
    """out_indices are 0-based over the reference's 8 layers: stages 0-6
    are the inverted-residual stages, index 7 is the trailing 1x1
    ReLU6 conv to 1280*widen ch (mobilenet_v2.py:121-136 'conv2' — the
    ssdlite recipe taps (4, 7)). The default (1, 2, 4, 6) feeds 4-level
    necks at strides 4/8/16/32 (the reference detection default is
    (1, 2, 4, 7); index 6 and 7 share stride 32)."""
    out_indices: Sequence[int] = (1, 2, 4, 6)
    frozen_stages: int = -1
    widen_factor: float = 1.0
    act: str = "relu6"
    # True trains BN (batch_stats collection) like the yolov3-mbv2 recipe;
    # False keeps the norm_eval FrozenBatchNorm semantics
    train_bn: bool = False
    # scratch-recipe knobs (see InvertedResidual)
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    kernel_init: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, ...]:
        def norm(y, name):
            if self.train_bn:
                return TrainableBatchNorm(
                    momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                    name=name)(y, train)
            return FrozenBatchNorm(name=name)(y)

        def nn_Conv(*a, **kw):
            if self.kernel_init is not None:
                kw.setdefault("kernel_init", self.kernel_init)
            return nn.Conv(*a, **kw)

        c = make_divisible(32 * self.widen_factor)
        out = nn_Conv(c, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                      use_bias=False, name="stem_conv")(x)
        out = _act(norm(out, "stem_bn"), self.act)
        if self.frozen_stages >= 0:
            out = lax.stop_gradient(out)

        outs = []
        for i, (t, ch, n, s) in enumerate(ARCH):
            ch = make_divisible(ch * self.widen_factor)
            for b in range(n):
                out = InvertedResidual(
                    out_channels=ch, stride=s if b == 0 else 1,
                    expand_ratio=t, act=self.act, train_bn=self.train_bn,
                    bn_momentum=self.bn_momentum,
                    bn_epsilon=self.bn_epsilon,
                    kernel_init=self.kernel_init,
                    name=f"stage{i + 1}_block{b}")(out, train)
            if self.frozen_stages >= i + 1:
                out = lax.stop_gradient(out)
            if i in self.out_indices:
                outs.append(out)
        if 7 in self.out_indices:
            c = (int(1280 * self.widen_factor)
                 if self.widen_factor > 1.0 else 1280)
            out = nn_Conv(c, (1, 1), use_bias=False, name="conv2")(out)
            outs.append(_act(norm(out, "conv2_bn"), self.act))
        return tuple(outs)

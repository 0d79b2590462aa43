"""ResNet backbone (flax.linen, NHWC) with mmdet freeze semantics.

Parity target: mmdet/models/backbones/resnet.py — pytorch-style bottleneck
(stride on the 3x3 conv), ``frozen_stages`` stopping gradients through the
stem and early stages, and ``norm_eval`` keeping BatchNorm in inference mode
during training (reference: resnet.py:613-652). The DSKD flagship uses
depth=50, out_indices=(1, 2, 3), frozen_stages=1, BN frozen
(configs/deformable_detr/chaosuan_*_il.py:39-48).

TPU notes: NHWC layout, convolutions map onto the MXU; BN in eval mode is a
per-channel scale+shift that XLA fuses into the adjacent conv. Freezing is
expressed with jax.lax.stop_gradient at stage boundaries (exactly the
reference's requires_grad=False + eval) — the optimizer additionally masks
these params out (see dskd_tpu/train/optim.py).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class FrozenBatchNorm(nn.Module):
    """BatchNorm evaluated with running statistics (norm_eval semantics).

    Stats live in the 'batch_stats' collection; they are never updated here,
    matching the flagship recipe (BN requires_grad=False + norm_eval=True).
    """
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((c,), jnp.float32)).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((c,), jnp.float32)).value
        inv = lax.rsqrt(var + self.epsilon) * scale
        return (x - mean) * inv + bias


def _conv(features, kernel, stride=1, name=None):
    pad = kernel // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)], use_bias=False,
                   name=name)



def _make_layers(norm: str, ws: bool):
    """(conv_ctor, norm_ctor) for the gn / gn+ws recipe switch
    (configs/gn, configs/gn+ws: GroupNorm(32) everywhere, optionally
    weight-standardized convs; default stays the frozen-BN torchvision
    recipe)."""
    if ws:
        from .conv_ws import ConvWS

        def conv(features, kernel, strides=(1, 1), padding="SAME",
                 use_bias=False, feature_group_count=1, name=None):
            return ConvWS(features, kernel, strides=strides,
                          padding=padding, use_bias=use_bias,
                          feature_group_count=feature_group_count,
                          name=name)
    else:
        def conv(features, kernel, strides=(1, 1), padding="SAME",
                 use_bias=False, feature_group_count=1, name=None):
            return nn.Conv(features, kernel, strides=strides,
                           padding=padding, use_bias=use_bias,
                           feature_group_count=feature_group_count,
                           name=name)
    if norm == "gn":
        def make_norm(name):
            return nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name)
    else:
        def make_norm(name):
            return FrozenBatchNorm(name=name)
    return conv, make_norm


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _conv(self.planes, 3, self.stride, name="conv1")(x)
        out = FrozenBatchNorm(name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, name="conv2")(out)
        out = FrozenBatchNorm(name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            identity = FrozenBatchNorm(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """Pytorch-style bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4).

    ``dcn``: replace conv2 with (modulated) deformable convolution — the
    reference's DCN stage plugin (backbones/resnet.py dcn config variants).
    """
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    dcn: bool = False
    # GCNet ContextBlock after conv3 (configs/gcnet position='after_conv3')
    gcb: bool = False
    gcb_ratio: float = 0.25
    # GeneralizedAttention after conv2 (configs/empirical_attention
    # position='after_conv2', kv_stride=2)
    gen_attn: bool = False
    gen_attn_type: str = "1111"
    # gn / gn+ws recipe (configs/gn, configs/gn+ws)
    norm: str = "frozen"
    ws: bool = False
    # ResNeXt (backbones/resnext.py): grouped 3x3 with widened mid channels
    # width = floor(planes * base_width / 64) * groups
    groups: int = 1
    base_width: int = 64
    # mmdet resnet.py style: 'pytorch' strides conv2 (3x3), 'caffe'
    # strides conv1 (1x1) — the detectron-lineage recipes (YOLOF,
    # *_caffe configs) ship caffe-style checkpoints
    style: str = "pytorch"

    @nn.compact
    def __call__(self, x):
        conv, make_norm = _make_layers(self.norm, self.ws)
        identity = x
        width = (self.planes * self.base_width // 64) * self.groups
        s1, s2 = ((self.stride, 1) if self.style == "caffe"
                  else (1, self.stride))
        out = conv(width, (1, 1), strides=(s1, s1), name="conv1")(x)
        out = nn.relu(make_norm("bn1")(out))
        if self.dcn:
            from ..ops.deform_conv import DeformConv2d
            out = DeformConv2d(width, kernel_size=3,
                               stride=s2, padding=1,
                               modulated=True, name="conv2")(out)
        else:
            out = conv(width, (3, 3), strides=(s2, s2),
                       padding=[(1, 1), (1, 1)],
                       feature_group_count=self.groups,
                       name="conv2")(out)
        out = nn.relu(make_norm("bn2")(out))
        if self.gen_attn:
            from .plugins import GeneralizedAttention
            out = GeneralizedAttention(
                num_heads=8, attention_type=self.gen_attn_type,
                kv_stride=2, name="gen_attn")(out)
        out = conv(self.planes * self.expansion, (1, 1),
                   name="conv3")(out)
        out = make_norm("bn3")(out)
        if self.gcb:
            from .plugins import ContextBlock
            out = ContextBlock(ratio=self.gcb_ratio, name="gcb")(out)
        if self.downsample:
            identity = conv(self.planes * self.expansion, (1, 1),
                            strides=(self.stride, self.stride),
                            name="downsample_conv")(x)
            identity = make_norm("downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """ResNet with mmdet-style out_indices and frozen_stages.

    out_indices are 0-based stage ids: (1, 2, 3) returns C3, C4, C5
    (channels 512/1024/2048 for depth 50).
    """
    depth: int = 50
    out_indices: Sequence[int] = (1, 2, 3)
    frozen_stages: int = 1
    base_channels: int = 64
    # per-stage DCN switch (reference: dcn=dict(...), stage_with_dcn=
    # (False, True, True, True) in dcn config variants); bottleneck only
    dcn_stages: Sequence[bool] = (False, False, False, False)
    # per-stage GCNet ContextBlock (configs/gcnet stages=(F, T, T, T),
    # ratio 1/4 or 1/16); bottleneck only
    gcb_stages: Sequence[bool] = (False, False, False, False)
    gcb_ratio: float = 0.25
    # per-stage GeneralizedAttention (configs/empirical_attention:
    # stages (F, F, T, T), attention_type '0010' or '1111')
    gen_attn_stages: Sequence[bool] = (False, False, False, False)
    gen_attn_type: str = "1111"
    # gn / gn+ws recipe (configs/gn, configs/gn+ws): norm='gn' swaps the
    # frozen BNs for trainable GroupNorm(32); ws additionally
    # weight-standardizes every conv (bottleneck path only)
    norm: str = "frozen"
    ws: bool = False
    # ResNeXt (backbones/resnext.py:1-154): groups=32, base_width=4 for
    # resnext50_32x4d / resnext101_32x4d; groups=1 == plain ResNet
    groups: int = 1
    base_width: int = 64
    # 'pytorch' | 'caffe' stride placement (Bottleneck only)
    style: str = "pytorch"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        block_kind, stage_blocks = ARCH_SETTINGS[self.depth]
        block = Bottleneck if block_kind == "bottleneck" else BasicBlock

        conv, make_norm = _make_layers(self.norm, self.ws)
        # stem: 7x7/2 conv + BN + relu + 3x3/2 maxpool
        out = conv(self.base_channels, (7, 7), strides=(2, 2),
                   padding=[(3, 3), (3, 3)], name="stem_conv")(x)
        out = nn.relu(make_norm("stem_bn")(out))
        if self.frozen_stages >= 0:
            out = lax.stop_gradient(out)
        out = nn.max_pool(out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        for i, num_blocks in enumerate(stage_blocks):
            planes = self.base_channels * 2 ** i
            stride = 1 if i == 0 else 2
            dcn = (block is Bottleneck and i < len(self.dcn_stages)
                   and self.dcn_stages[i])
            gcb = (block is Bottleneck and i < len(self.gcb_stages)
                   and self.gcb_stages[i])
            for b in range(num_blocks):
                kw = {"dcn": True} if dcn else {}
                if gcb:
                    kw.update(gcb=True, gcb_ratio=self.gcb_ratio)
                if block is Bottleneck:
                    kw.update(groups=self.groups,
                              base_width=self.base_width,
                              norm=self.norm, ws=self.ws,
                              style=self.style)
                    if (i < len(self.gen_attn_stages)
                            and self.gen_attn_stages[i]):
                        kw.update(gen_attn=True,
                                  gen_attn_type=self.gen_attn_type)
                # torch rule: projection shortcut iff stride != 1 or
                # in_c != out_c. BasicBlock stage 1 (stride 1, 64->64)
                # has NO downsample (resnet.py _make_stage_layer);
                # Bottleneck stage 1 does (64 -> planes*4).
                out = block(planes=planes,
                            stride=stride if b == 0 else 1,
                            downsample=(b == 0 and
                                        (i > 0 or block is Bottleneck)),
                            name=f"layer{i + 1}_block{b}", **kw)(out)
            if self.frozen_stages >= i + 1:
                out = lax.stop_gradient(out)
            if i in self.out_indices:
                outs.append(out)
        return tuple(outs)

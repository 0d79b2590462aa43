"""DetectoRS backbone + RFP neck (parity: mmdet/models/backbones/
detectors_resnet.py + mmdet/models/necks/rfp.py + mmcv SAConv2d).

Two mechanisms:
  * SAC (Switchable Atrous Convolution): the bottleneck 3x3 runs twice on
    the SAME kernel — dilation 1 and dilation 3 with a zero-init residual
    weight delta — blended per pixel by a switch S = sigmoid(1x1 conv of
    5x5-avg-pooled input); zero-init global pre/post context 1x1 convs on
    GAP features bracket the op. At init (delta = switch = contexts = 0)
    SAC reduces to an even blend of two identical convs = the plain conv.
  * RFP (Recursive Feature Pyramid): run backbone -> FPN, transform each
    pyramid level with an ASPP (3 atrous branches + GAP branch), feed the
    results back as per-stage residuals (zero-init rfp_conv on the first
    block of stages 2-4) into a SECOND backbone step, FPN again (shared
    FPN weights), and fuse the two pyramids with a zero-init
    sigmoid-gated per-pixel weight.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fpn import FPN
from .resnet import FrozenBatchNorm


class SAConv(nn.Module):
    features: int
    stride: int = 1
    groups: int = 1        # ResNeXt variant (detectors_resnext.py)

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", nn.initializers.he_normal(),
                       (3, 3, x.shape[-1] // self.groups, self.features))
        dw = self.param("weight_diff", nn.initializers.zeros, w.shape)
        pre = nn.Conv(x.shape[-1], (1, 1),
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name="pre_context")(x.mean((1, 2), keepdims=True))
        x = x + pre
        sw_in = nn.avg_pool(x, (5, 5), strides=(1, 1),
                            padding=((2, 2), (2, 2)))
        s = jax.nn.sigmoid(nn.Conv(
            1, (1, 1), kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="switch")(sw_in))
        if self.stride > 1:
            s = s[:, ::self.stride, ::self.stride]

        def conv(inp, kern, d):
            return jax.lax.conv_general_dilated(
                inp, kern, window_strides=(self.stride, self.stride),
                padding=[(d, d), (d, d)], rhs_dilation=(d, d),
                feature_group_count=self.groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        out = s * conv(x, w, 1) + (1 - s) * conv(x, w + dw, 3)
        post = nn.Conv(self.features, (1, 1),
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       name="post_context")(out.mean((1, 2),
                                                     keepdims=True))
        return out + post


class SACBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    use_sac: bool = True
    rfp: bool = False      # first block of an RFP-fed stage
    # ResNeXt grouping (detectors_resnext.py:28-32: width scales by
    # base_width/64 * groups); groups=1 == plain DetectoRS ResNet
    groups: int = 1
    base_width: int = 4

    @nn.compact
    def __call__(self, x, rfp_feat=None):
        idn = x
        width = (self.planes if self.groups == 1
                 else (self.planes * self.base_width // 64) * self.groups)
        y = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(FrozenBatchNorm(name="bn1")(y))
        if self.use_sac:
            y = SAConv(width, stride=self.stride, groups=self.groups,
                       name="conv2")(y)
        else:
            y = nn.Conv(width, (3, 3),
                        strides=(self.stride, self.stride),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        feature_group_count=self.groups,
                        name="conv2")(y)
        y = nn.relu(FrozenBatchNorm(name="bn2")(y))
        y = nn.Conv(4 * self.planes, (1, 1), use_bias=False,
                    name="conv3")(y)
        y = FrozenBatchNorm(name="bn3")(y)
        if self.downsample:
            idn = nn.Conv(4 * self.planes, (1, 1),
                          strides=(self.stride, self.stride),
                          use_bias=False, name="downsample_conv")(x)
            idn = FrozenBatchNorm(name="downsample_bn")(idn)
        out = y + idn
        if self.rfp and rfp_feat is not None:
            out = out + nn.Conv(4 * self.planes, (1, 1),
                                kernel_init=nn.initializers.zeros,
                                bias_init=nn.initializers.zeros,
                                name="rfp_conv")(rfp_feat)
        return nn.relu(out)


class DetectoRSResNet(nn.Module):
    """ResNet-50 with SAC on stages 2-4 and RFP residual hooks.
    ``groups``/``base_width`` give the ResNeXt variant
    (detectors_resnext.py, e.g. groups=32 base_width=4)."""
    depth: int = 50
    frozen_stages: int = 1
    sac_stages: Sequence[bool] = (False, True, True, True)
    groups: int = 1
    base_width: int = 4

    @nn.compact
    def __call__(self, x, rfp_feats=None):
        # reference DetectoRS is bottleneck-only (depths 50/101); 18 is a
        # one-block-per-stage ladder for CI-size config shrinks
        blocks = {18: (1, 1, 1, 1), 50: (3, 4, 6, 3),
                  101: (3, 4, 23, 3)}[self.depth]
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="stem_conv")(x)
        y = nn.relu(FrozenBatchNorm(name="stem_bn")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        if self.frozen_stages >= 0:
            y = jax.lax.stop_gradient(y)
        outs = []
        for s in range(4):
            planes = 64 * 2 ** s
            feat = (rfp_feats[s] if (rfp_feats is not None and s > 0)
                    else None)
            for b in range(blocks[s]):
                y = SACBottleneck(
                    planes, stride=2 if (b == 0 and s > 0) else 1,
                    downsample=(b == 0), use_sac=self.sac_stages[s],
                    rfp=(b == 0 and s > 0), groups=self.groups,
                    base_width=self.base_width,
                    name=f"layer{s + 1}_block{b}")(y, feat)
            if s + 1 <= self.frozen_stages:
                y = jax.lax.stop_gradient(y)
            outs.append(y)
        return tuple(outs)


class ASPP(nn.Module):
    """RFP's pyramid transform: 3 atrous 3x3 branches + a GAP 1x1 branch,
    relu'd and concatenated back to the input width."""
    out_channels: int

    @nn.compact
    def __call__(self, x):
        q = self.out_channels // 4
        outs = []
        for i, d in enumerate((1, 3, 6)):
            outs.append(nn.relu(nn.Conv(
                q, (3, 3), padding=[(d, d), (d, d)], kernel_dilation=(d, d),
                name=f"aspp{i}")(x)))
        g = nn.relu(nn.Conv(q, (1, 1), name="aspp3")(
            x.mean((1, 2), keepdims=True)))
        outs.append(jnp.broadcast_to(g, outs[0].shape[:3] + (q,)))
        return jnp.concatenate(outs, -1)


class RFP(nn.Module):
    """Recursive feature pyramid over two DetectoRS backbone steps.

    ``sac_stages`` selects the rfp-only reference variant
    (configs/detectors/cascade_rcnn_r50_rfp_1x_coco.py: plain convs,
    all-False) vs the full DetectoRS recipe (detectors_cascade_rcnn:
    SAC on stages 2-4)."""
    out_channels: int = 256
    num_outs: int = 5
    rfp_steps: int = 2
    depth: int = 50
    frozen_stages: int = 1
    sac_stages: Sequence[bool] = (False, True, True, True)

    @nn.compact
    def __call__(self, images):
        bb0 = DetectoRSResNet(depth=self.depth,
                              frozen_stages=self.frozen_stages,
                              sac_stages=tuple(self.sac_stages),
                              name="backbone")
        # start_level=0 so pyramid level i matches res-stage i's stride —
        # the RFP residual for stage s is aspp(x[s]) at the same resolution
        fpn = FPN(out_channels=self.out_channels, num_outs=self.num_outs,
                  start_level=0, add_extra_convs="on_input",
                  relu_before_extra_convs=False, name="neck")
        aspp = ASPP(self.out_channels, name="rfp_aspp")
        rfp_w = nn.Conv(1, (1, 1), kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros, name="rfp_weight")

        feats = bb0(images)
        x = fpn(feats)
        for step in range(self.rfp_steps - 1):
            rfp_feats = (x[0],) + tuple(aspp(x[i])
                                        for i in range(1, len(x)))
            bb_i = DetectoRSResNet(depth=self.depth,
                                   frozen_stages=self.frozen_stages,
                                   sac_stages=tuple(self.sac_stages),
                                   name=f"rfp_backbone{step}")
            feats_i = bb_i(images, rfp_feats=rfp_feats)
            x_i = fpn(feats_i)
            x = tuple(
                jax.nn.sigmoid(rfp_w(xi)) * xi
                + (1 - jax.nn.sigmoid(rfp_w(xi))) * xo
                for xi, xo in zip(x_i, x))
        return x

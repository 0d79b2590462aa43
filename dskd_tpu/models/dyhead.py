"""DyHead neck (parity: mmdet/models/necks/dyhead.py + configs/dyhead/
atss_r50_fpn_dyhead_1x_coco.py, box AP 42.4).

Each DyHead block applies three attentions to the FPN pyramid:
  * spatial: a shared offset/mask conv (zero-init) drives modulated
    deformable 3x3 convs over the level itself (mid), the higher-res
    neighbor (low, stride 2) and the lower-res neighbor (high, bilinear
    up-sampled back), averaged;
  * scale: per-level hard-sigmoid gate from a GAP -> 1x1 -> relu squeeze
    of each contribution;
  * task: DyReLU — max(x*a1+b1, x*a2+b2) with (a, b) predicted from GAP
    (a1 in [0,2] around 1, a2 in [-1,1], b in [-0.5,0.5]).

Deviation (documented): the reference feeds the level-resolution offset
tensor into the HIGH conv running at half resolution (the CUDA kernel
then reads a strided subset — microsoft/DynamicHead#25 calls the order
"weird"); here the offsets are nearest-downsampled 2x for that conv,
the well-defined equivalent.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.deform_conv import deform_conv2d


def hard_sigmoid(x, bias: float = 3.0, divisor: float = 6.0):
    return jnp.clip((x + bias) / divisor, 0.0, 1.0)


def _upsample_align_corners(x, out_hw):
    """Bilinear resize with torch's align_corners=True grid (the
    reference's F.interpolate call, dyhead.py:118-122); jax.image.resize
    only offers the half-pixel (align_corners=False) convention."""
    B, h2, w2, C = x.shape
    H, W = out_hw
    ys = jnp.linspace(0.0, h2 - 1.0, H)
    xs = jnp.linspace(0.0, w2 - 1.0, W)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h2 - 1)
    x1 = jnp.minimum(x0 + 1, w2 - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    rows0 = x[:, y0]
    rows1 = x[:, y1]
    top = rows0[:, :, x0] * (1 - wx) + rows0[:, :, x1] * wx
    bot = rows1[:, :, x0] * (1 - wx) + rows1[:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class DyReLU(nn.Module):
    channels: int
    ratio: int = 4

    @nn.compact
    def __call__(self, x):
        c = self.channels
        g = x.mean(axis=(1, 2), keepdims=True)
        # every plain conv in the block is normal_init(std=0.01)
        # (dyhead.py:93-97 _init_weights)
        init = nn.initializers.normal(0.01)
        g = nn.relu(nn.Conv(c // self.ratio, (1, 1), kernel_init=init,
                            name="conv1")(g))
        g = hard_sigmoid(nn.Conv(4 * c, (1, 1), kernel_init=init,
                                 name="conv2")(g)) - 0.5
        a1 = g[..., :c] * 2.0 + 1.0
        b1 = g[..., c:2 * c]
        a2 = g[..., 2 * c:3 * c] * 2.0
        b2 = g[..., 3 * c:]
        return jnp.maximum(x * a1 + b1, x * a2 + b2)


class _DyDCN(nn.Module):
    """Modulated deform conv (external offsets) + GN(16)."""
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, offsets, mask):
        # mmcv ModulatedDeformConv2d.init_weights: uniform(-s, s) with
        # s = 1/sqrt(fan_in) => variance 1/(3*fan_in)
        w = self.param("kernel",
                       nn.initializers.variance_scaling(
                           1.0 / 3.0, "fan_in", "uniform"),
                       (3, 3, x.shape[-1], self.out_channels))
        y = deform_conv2d(x, offsets, w, stride=self.stride, padding=1,
                          mask=mask)
        return nn.GroupNorm(epsilon=1e-5, num_groups=16, name="gn")(y)


class DyHeadBlock(nn.Module):
    out_channels: int = 256

    @nn.compact
    def __call__(self, feats):
        conv_high = _DyDCN(self.out_channels, name="spatial_conv_high")
        conv_mid = _DyDCN(self.out_channels, name="spatial_conv_mid")
        conv_low = _DyDCN(self.out_channels, stride=2,
                          name="spatial_conv_low")
        offset_conv = nn.Conv(27, (3, 3), padding=[(1, 1), (1, 1)],
                              kernel_init=nn.initializers.zeros,
                              bias_init=nn.initializers.zeros,
                              name="spatial_conv_offset")
        scale_c = nn.Conv(1, (1, 1),
                          kernel_init=nn.initializers.normal(0.01),
                          name="scale_attn_conv")
        task = DyReLU(self.out_channels, name="task_attn")

        def scale_attn(f):
            return hard_sigmoid(nn.relu(
                scale_c(f.mean(axis=(1, 2), keepdims=True))))

        outs = []
        L = len(feats)
        for lvl in range(L):
            om = offset_conv(feats[lvl])
            offsets, mask = om[..., :18], jax.nn.sigmoid(om[..., 18:])
            mid = conv_mid(feats[lvl], offsets, mask)
            s = mid * scale_attn(mid)
            n = 1
            if lvl > 0:
                low = conv_low(feats[lvl - 1], offsets, mask)
                s = s + low * scale_attn(low)
                n += 1
            if lvl < L - 1:
                off_ds = offsets[:, ::2, ::2]
                mask_ds = mask[:, ::2, ::2]
                hi = conv_high(feats[lvl + 1], off_ds, mask_ds)
                hi = _upsample_align_corners(hi, mid.shape[1:3])
                s = s + hi * scale_attn(hi)
                n += 1
            outs.append(task(s / n))
        return tuple(outs)


class DyHead(nn.Module):
    out_channels: int = 256
    num_blocks: int = 6

    @nn.compact
    def __call__(self, feats) -> Tuple[jnp.ndarray, ...]:
        for i in range(self.num_blocks):
            feats = DyHeadBlock(self.out_channels, name=f"block{i}")(feats)
        return tuple(feats)

"""Deformable convolution v1/v2 (DCN / modulated DCN).

Parity target: mmcv.ops.DeformConv2d / ModulatedDeformConv2d as consumed by
mmdet ResNet DCN stages (backbones/resnet.py, dcn/dcnv2 config variants).
Semantics: each kernel tap (a, b) of output position (i, j) samples the
input bilinearly at (i*stride - pad + a*dil + dy, j*stride - pad + b*dil +
dx) with learned per-position offsets (and a sigmoid modulation mask for
v2), zeros outside the image; the taps then contract with the conv weight.

TPU formulation: one packed 4-corner gather per tap batch (the MSDA
machinery's layout) followed by an MXU einsum over (taps x Cin). DCN is a
config-variant op (not in the DSKD flagship), so the gather uses the plain
XLA path — correctness first.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def deform_conv2d(x: jnp.ndarray, offsets: jnp.ndarray, weight: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None, stride: int = 1,
                  padding: int = 1, dilation: int = 1,
                  mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: (B, H, W, Cin) NHWC; offsets: (B, Ho, Wo, K*2) as mmcv's
    interleaved (dy, dx) per tap (taps row-major); weight: (kh, kw, Cin,
    Cout); mask: (B, Ho, Wo, K) modulation (already sigmoided) for DCNv2.
    Returns (B, Ho, Wo, Cout)."""
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    off = offsets.reshape(B, Ho, Wo, K, 2)
    dy, dx = off[..., 0], off[..., 1]

    ii = jnp.arange(Ho, dtype=x.dtype)[:, None, None]          # (Ho,1,1)
    jj = jnp.arange(Wo, dtype=x.dtype)[None, :, None]          # (1,Wo,1)
    aa = jnp.arange(kh, dtype=x.dtype).repeat(kw)[None, None]  # (1,1,K)
    bb = jnp.tile(jnp.arange(kw, dtype=x.dtype), kh)[None, None]
    ys = ii * stride - padding + aa * dilation + dy            # (B,Ho,Wo,K)
    xs = jj * stride - padding + bb * dilation + dx

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ty = ys - y0
    tx = xs - x0

    def corner(yc, xc, wgt):
        inb = (yc >= 0) & (yc < H) & (xc >= 0) & (xc < W)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        flat = (yi * W + xi).reshape(B, -1)                    # (B, N)
        v = jnp.take_along_axis(x.reshape(B, H * W, Cin),
                                flat[..., None], axis=1)
        v = v.reshape(B, Ho, Wo, K, Cin)
        return v * (wgt * inb.astype(x.dtype))[..., None]

    sampled = (corner(y0, x0, (1 - ty) * (1 - tx))
               + corner(y0, x0 + 1, (1 - ty) * tx)
               + corner(y0 + 1, x0, ty * (1 - tx))
               + corner(y0 + 1, x0 + 1, ty * tx))              # (B,Ho,Wo,K,C)
    if mask is not None:
        sampled = sampled * mask[..., None]

    out = jnp.einsum("bhwkc,kco->bhwo", sampled,
                     weight.reshape(K, Cin, Cout))
    if bias is not None:
        out = out + bias
    return out


class DeformConv2d(nn.Module):
    """DCN block: a sibling conv predicts offsets (+ mask for v2) from the
    input, initialized to zero so the op starts as a plain conv (mmcv's
    conv_offset zero init)."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    modulated: bool = False     # True = DCNv2 (ModulatedDeformConv2d)
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        K = k * k
        n_off = 3 * K if self.modulated else 2 * K
        raw = nn.Conv(n_off, (k, k), strides=(self.stride, self.stride),
                      padding=[(self.padding, self.padding)] * 2,
                      kernel_dilation=(self.dilation, self.dilation),
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name="conv_offset")(x)
        if self.modulated:
            offsets, mask = raw[..., :2 * K], jax.nn.sigmoid(
                raw[..., 2 * K:])
        else:
            offsets, mask = raw, None
        weight = self.param(
            "kernel", nn.initializers.he_normal(),
            (k, k, x.shape[-1], self.out_channels))
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.out_channels,))
                if self.use_bias else None)
        return deform_conv2d(x, offsets, weight, bias, self.stride,
                             self.padding, self.dilation, mask)

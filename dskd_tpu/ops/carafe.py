"""CARAFE — Content-Aware ReAssembly of FEatures (parity: mmcv.ops.carafe
as consumed by mmdet necks/fpn_carafe.py; k_up=5, k_encoder=3,
compressed channels 64, scale 2).

The CUDA kernel's semantics re-expressed with pure XLA ops (no gathers,
TPU-friendly): a channel compressor + content encoder predict, per input
position, sigma^2 * k_up^2 reassembly logits; pixel-shuffle spreads them
to the sigma-x output grid; softmax over the k_up^2 window; each output
pixel is the predicted-kernel weighted sum of the k_up x k_up input
neighborhood around its source pixel. Neighborhood extraction uses
conv_general_dilated_patches (a convolution, not a gather).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def carafe_reassemble(x: jnp.ndarray, kernels: jnp.ndarray,
                      k_up: int = 5, scale: int = 2) -> jnp.ndarray:
    """x: (B, H, W, C); kernels: (B, scale*H, scale*W, k_up^2) softmaxed
    reassembly weights. Returns (B, scale*H, scale*W, C)."""
    B, H, W, C = x.shape
    pad = k_up // 2
    # (B, H, W, C*k_up*k_up) patches, feature-major then window offsets
    patches = jax.lax.conv_general_dilated_patches(
        x, (k_up, k_up), (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    patches = patches.reshape(B, H, W, C, k_up * k_up)
    # nearest-upsample the patch table to the output grid
    up = jnp.repeat(jnp.repeat(patches, scale, axis=1), scale, axis=2)
    return jnp.einsum("bhwck,bhwk->bhwc", up, kernels)


class CARAFE(nn.Module):
    """mmcv CARAFEPack: channel compressor -> content encoder ->
    pixel-shuffle -> softmax -> reassembly."""
    channels: int = 256
    scale: int = 2
    k_up: int = 5
    k_encoder: int = 3
    compressed: int = 64

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        s, k2 = self.scale, self.k_up * self.k_up
        comp = nn.Conv(self.compressed, (1, 1),
                       name="channel_compressor")(x)
        pe = self.k_encoder // 2
        logits = nn.Conv(s * s * k2, (self.k_encoder, self.k_encoder),
                         padding=[(pe, pe), (pe, pe)],
                         name="content_encoder")(comp)
        # pixel shuffle (B, H, W, s*s*k2) -> (B, sH, sW, k2)
        logits = logits.reshape(B, H, W, s, s, k2)
        logits = logits.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, s * H, s * W, k2)
        kernels = jax.nn.softmax(logits, axis=-1)
        return carafe_reassemble(x, kernels, self.k_up, self.scale)

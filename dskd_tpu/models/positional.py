"""Sine positional encoding (parity: mmcv SinePositionalEncoding).

Reference config: num_feats=128, normalize=True, offset=-0.5, scale=2*pi,
temperature=10000 (configs/deformable_detr/chaosuan_*_il.py:97-101). The
encoding is built from cumulative sums of the valid-pixel mask so padded
regions do not shift the phase; channel order is [pos_y, pos_x].
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def sine_positional_encoding(mask: jnp.ndarray,
                             num_feats: int = 128,
                             temperature: float = 10000.0,
                             normalize: bool = True,
                             scale: float = 2 * math.pi,
                             offset: float = -0.5,
                             eps: float = 1e-6,
                             dtype=jnp.float32) -> jnp.ndarray:
    """Compute sine PE from a padding mask.

    Args:
      mask: (B, H, W) bool, True at PADDED (invalid) pixels — the mmcv
        convention.
      dtype: output dtype (phases compute in f32 for stability; the result
        is cast so bf16 models stay bf16 end-to-end).

    Returns:
      (B, H, W, 2*num_feats) positional embedding, channels [pos_y, pos_x].
    """
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        y_embed = (y_embed + offset) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed + offset) / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos_x = x_embed[..., None] / dim_t          # (B, H, W, num_feats)
    pos_y = y_embed[..., None] / dim_t
    # interleave sin on even channels, cos on odd channels
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(pos_x.shape[:-1] + (num_feats,))
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(pos_y.shape[:-1] + (num_feats,))
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)

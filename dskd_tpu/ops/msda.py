"""Multi-scale deformable attention sampling core.

TPU-native formulation of the reference's CUDA kernel
(mmcv.ops.MultiScaleDeformableAttention -> ms_deform_attn_cuda): each query
bilinearly samples ``num_points`` locations from every feature level and
every head, then reduces with softmaxed attention weights.

Semantics match ``F.grid_sample(align_corners=False, padding_mode='zeros')``
applied per level: a normalized location p in [0, 1] maps to pixel space as
``p * size - 0.5``; out-of-bounds corners contribute zero.

Two implementations:
  * ``ms_deform_attn_core``: pure-XLA gather formulation. Levels are
    processed via a static Python loop (shapes are static per level);
    corner gathers reduce immediately so the peak intermediate is
    (B, Q, H, P, D) per corner, not the full (B, Q, H, L, P, D, 4) tensor.
  * a Pallas kernel (planned) that fuses the 4 corner gathers and the
    weighted reduction in VMEM for the encoder's large-Q case.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(value_hw: jnp.ndarray, loc: jnp.ndarray,
                     h: int, w: int) -> jnp.ndarray:
    """Bilinear sample one level for all (query, head, point).

    value_hw: (B, h*w, H, D) level features.
    loc: (B, Q, H, P, 2) normalized sampling locations (x, y) in [0, 1].
    Returns (B, Q, H, P, D).
    """
    B, S, H, D = value_hw.shape
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0

    out = None
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            wgt = (tx if dx else 1.0 - tx) * (ty if dy else 1.0 - ty)
            inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            flat = yi_c * w + xi_c                         # (B, Q, H, P)
            Bq = flat.shape[1] * flat.shape[3]
            idx = flat.transpose(0, 1, 3, 2).reshape(B, Bq, H, 1)
            g = jnp.take_along_axis(value_hw, idx, axis=1)  # (B, Q*P, H, D)
            g = g.reshape(B, flat.shape[1], flat.shape[3], H, D)
            g = g.transpose(0, 1, 3, 2, 4)                  # (B, Q, H, P, D)
            contrib = g * (wgt * inb.astype(value_hw.dtype))[..., None]
            out = contrib if out is None else out + contrib
    return out


def ms_deform_attn_core(value: jnp.ndarray,
                        spatial_shapes: Sequence[Tuple[int, int]],
                        sampling_locations: jnp.ndarray,
                        attention_weights: jnp.ndarray) -> jnp.ndarray:
    """Fused multi-scale deformable sampling.

    Args:
      value: (B, S, H, D) flattened multi-level features (S = sum h*w).
      spatial_shapes: static list of (h, w) per level.
      sampling_locations: (B, Q, H, L, P, 2) normalized (x, y).
      attention_weights: (B, Q, H, L, P), softmaxed over L*P.

    Returns:
      (B, Q, H*D).
    """
    B, S, H, D = value.shape
    Q = sampling_locations.shape[1]
    out = jnp.zeros((B, Q, H, D), value.dtype)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = jax.lax.dynamic_slice_in_dim(value, start, h * w, axis=1)
        loc = sampling_locations[:, :, :, lvl]      # (B, Q, H, P, 2)
        sampled = _bilinear_gather(v, loc, h, w)    # (B, Q, H, P, D)
        wgt = attention_weights[:, :, :, lvl]       # (B, Q, H, P)
        out = out + (sampled * wgt[..., None]).sum(axis=3)
        start += h * w
    return out.reshape(B, Q, H * D)

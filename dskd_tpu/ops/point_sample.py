"""point_sample: bilinear sampling of feature maps at normalized points.

Parity: mmcv.ops.point_sample (consumed by mmdet mask_point_head /
point_rend, models/utils/point_sample.py) — F.grid_sample with
align_corners=False over points in [0, 1]^2.

Same sampling convention as ops/msda.py (x * W - 0.5 pixel mapping,
zero padding outside), expressed as four gathers + bilinear weights; the
point counts here are tiny (hundreds per ROI) so XLA gathers are fine.
"""
from __future__ import annotations

import jax.numpy as jnp


def point_sample(features: jnp.ndarray, points: jnp.ndarray,
                 align_corners: bool = False) -> jnp.ndarray:
    """Sample (B, H, W, C) features at (B, P, 2) normalized (x, y) points.

    Returns (B, P, C). Points outside [0, 1] contribute zeros at their
    out-of-bounds corners (grid_sample padding_mode='zeros').
    """
    B, H, W, C = features.shape
    x = points[..., 0].astype(jnp.float32)
    y = points[..., 1].astype(jnp.float32)
    if align_corners:
        xs = x * (W - 1)
        ys = y * (H - 1)
    else:
        xs = x * W - 0.5
        ys = y * H - 0.5
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    tx = (xs - x0)[..., None]
    ty = (ys - y0)[..., None]

    flat = features.reshape(B, H * W, C)

    def tap(yc, xc):
        inb = ((xc >= 0) & (xc < W) & (yc >= 0) & (yc < H))
        idx = (jnp.clip(yc, 0, H - 1) * W
               + jnp.clip(xc, 0, W - 1)).astype(jnp.int32)
        v = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return v * inb[..., None]

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    out = ((1 - tx) * (1 - ty) * v00 + tx * (1 - ty) * v01
           + (1 - tx) * ty * v10 + tx * ty * v11)
    return out.astype(features.dtype)

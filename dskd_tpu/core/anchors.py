"""Anchor generation + delta box coding (parity: mmdet core/anchor +
core/bbox/coder/delta_xywh_bbox_coder.py).

Used by the CNN-head families (YOLOF single-level C5 anchors: base_size 32,
scales [1,2,4,8,16], ratio 1.0 — configs/yolof/yolof_r50_c5_8x8_1x_coco.py).
All functions are pure and jit-friendly with static shapes.
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def base_anchors(base_size: float, scales: Sequence[float],
                 ratios: Sequence[float]) -> np.ndarray:
    """(S*R, 4) xyxy anchors centered at origin (center_offset=0)."""
    out = []
    for r in ratios:
        h_ratio = math.sqrt(r)
        w_ratio = 1.0 / h_ratio
        for s in scales:
            w = base_size * s * w_ratio
            h = base_size * s * h_ratio
            out.append([-w / 2, -h / 2, w / 2, h / 2])
    return np.array(out, np.float32)


def grid_anchors(featmap_size: Tuple[int, int], stride: int,
                 base: np.ndarray) -> jnp.ndarray:
    """(H*W*A, 4) anchors for one level; row-major (y, x, anchor) order."""
    h, w = featmap_size
    xs = jnp.arange(w, dtype=jnp.float32) * stride
    ys = jnp.arange(h, dtype=jnp.float32) * stride
    shift_x = jnp.tile(xs[None, :], (h, 1)).reshape(-1)
    shift_y = jnp.tile(ys[:, None], (1, w)).reshape(-1)
    shifts = jnp.stack([shift_x, shift_y, shift_x, shift_y], -1)  # (HW, 4)
    anchors = shifts[:, None, :] + jnp.asarray(base)[None, :, :]
    return anchors.reshape(-1, 4)


def delta2bbox(anchors: jnp.ndarray, deltas: jnp.ndarray,
               means=(0.0, 0.0, 0.0, 0.0), stds=(1.0, 1.0, 1.0, 1.0),
               wh_ratio_clip: float = 16 / 1000,
               add_ctr_clamp: bool = False,
               ctr_clamp: float = 32.0) -> jnp.ndarray:
    """Decode (dx, dy, dw, dh) deltas against xyxy anchors -> xyxy boxes.

    YOLOF decodes with add_ctr_clamp=True, ctr_clamp=32 (its config's
    DeltaXYWHBBoxCoder)."""
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    d = deltas * stds + means
    dxy, dwh = d[..., :2], d[..., 2:]

    pxy = (anchors[..., :2] + anchors[..., 2:]) * 0.5
    pwh = anchors[..., 2:] - anchors[..., :2]

    max_ratio = abs(math.log(wh_ratio_clip))
    dxy_wh = pwh * dxy
    if add_ctr_clamp:
        dxy_wh = jnp.clip(dxy_wh, -ctr_clamp, ctr_clamp)
        dwh = jnp.clip(dwh, None, max_ratio)
    else:
        dwh = jnp.clip(dwh, -max_ratio, max_ratio)

    gxy = pxy + dxy_wh
    gwh = pwh * jnp.exp(dwh)
    x1y1 = gxy - gwh * 0.5
    x2y2 = gxy + gwh * 0.5
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def bbox2delta(anchors: jnp.ndarray, gt: jnp.ndarray,
               means=(0.0, 0.0, 0.0, 0.0),
               stds=(1.0, 1.0, 1.0, 1.0), eps: float = 1e-6) -> jnp.ndarray:
    """Encode xyxy gt against xyxy anchors -> (dx, dy, dw, dh)."""
    pxy = (anchors[..., :2] + anchors[..., 2:]) * 0.5
    pwh = jnp.clip(anchors[..., 2:] - anchors[..., :2], eps, None)
    gxy = (gt[..., :2] + gt[..., 2:]) * 0.5
    gwh = jnp.clip(gt[..., 2:] - gt[..., :2], eps, None)
    dxy = (gxy - pxy) / pwh
    dwh = jnp.log(gwh / pwh)
    d = jnp.concatenate([dxy, dwh], -1)
    return (d - jnp.asarray(means, d.dtype)) / jnp.asarray(stds, d.dtype)

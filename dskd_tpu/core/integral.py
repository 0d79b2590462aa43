"""GFL distribution -> distance integrals.

``integral_average`` replicates the flagship head's Integral_average
(reference: mmdet/models/dense_heads/gfl_deformable_detr_head_il.py:23-60):
the 4x(reg_max+1) distribution (already sigmoided by the head) is normalized
by its RAW SUM (not a softmax — a documented reference quirk), integrated
against bins linspace(0, reg_max)/reg_max/2 (range [0, 0.5]), and the four
distance expectations are pair-summed to (w, h) = (left+right, top+bottom).

``integral`` is the canonical GFL projection (mmdet gfl_head.py Integral):
softmax over bins then expectation against linspace(0, reg_max).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def integral_average(x: jnp.ndarray, reg_max: int = 16,
                     eps: float = 1e-12) -> jnp.ndarray:
    """(..., 4*(reg_max+1)) sigmoided distributions -> (..., 2) = (w, h)."""
    lead = x.shape[:-1]
    n = reg_max + 1
    x = x.reshape(lead + (4, n))
    x = x / jnp.clip(x.sum(axis=-1, keepdims=True), eps, None)
    space = jnp.linspace(0.0, reg_max, n, dtype=x.dtype) / reg_max / 2.0
    dist = (x * space).sum(axis=-1)              # (..., 4) each in [0, 0.5]
    wh = dist.reshape(lead + (2, 2)).sum(axis=-1)  # (l+r, t+b) = (w, h)
    return wh


def integral(x: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Canonical GFL: (..., 4*(reg_max+1)) logits -> (..., 4) distances."""
    lead = x.shape[:-1]
    n = reg_max + 1
    p = jax.nn.softmax(x.reshape(lead + (4, n)), axis=-1)
    proj = jnp.linspace(0.0, reg_max, n, dtype=x.dtype)
    return (p * proj).sum(axis=-1)

"""Corner pooling (parity: mmcv.ops.CornerPool, consumed by
mmdet corner_head.py).

The CUDA kernel is a directional running max; on TPU that is exactly a
(possibly reversed) ``lax.cummax`` along the spatial axis — fully fused,
no custom kernel needed (SURVEY §2.8 "cummax formulation in pure XLA").

NHWC layout: top/bottom pool along H (axis 1), left/right along W (axis 2).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def corner_pool(x: jnp.ndarray, direction: str) -> jnp.ndarray:
    """Directional corner pool of an NHWC tensor.

    'top' — each pixel takes the max over itself and everything BELOW it
    (the CornerNet top-left corner looks down); 'bottom' the reverse;
    'left' looks right; 'right' looks left.
    """
    if direction == "top":
        return lax.cummax(x, axis=1, reverse=True)
    if direction == "bottom":
        return lax.cummax(x, axis=1)
    if direction == "left":
        return lax.cummax(x, axis=2, reverse=True)
    if direction == "right":
        return lax.cummax(x, axis=2)
    raise ValueError(f"unknown corner pool direction {direction!r}")

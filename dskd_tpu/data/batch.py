"""The padded global-batch structure, in a jax-free module so the data
loader (and its spawned process workers) import without touching the
backend. ``train.step`` re-exports it — both import paths are public.

The annotations describe jnp arrays on device; the loader fills the same
structure with numpy arrays (a NamedTuple is just a container — the
train step's device_put/sharding does the transfer).
"""
from __future__ import annotations

from typing import Any, NamedTuple


class Batch(NamedTuple):
    """One padded global batch.

    images: (B, H, W, 3) normalized NHWC.
    img_hw: (B, 2) valid (h, w) after resize (the reference's img_shape).
    gt_bboxes: (B, G, 4) xyxy in input coords; gt_labels: (B, G) int32;
    gt_valid: (B, G) bool.
    """
    images: Any
    img_hw: Any
    gt_bboxes: Any
    gt_labels: Any
    gt_valid: Any
    # optional padded GT instance bitmaps at mask_stride resolution
    # (B, G, H/stride, W/stride); None for box-only families
    gt_masks: Any = None
    # optional per-pixel semantic GT at mask_stride resolution
    # (B, H/stride, W/stride) int32 contiguous labels, 255 = void/pad;
    # None except for panoptic families
    gt_semantic: Any = None

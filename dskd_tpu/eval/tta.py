"""Test-time augmentation (parity: MultiScaleFlipAug + merge_augs).

Each image runs through every (scale, flip) variant; detections are mapped
back to original-image coordinates (unflip + un-scale, the reference's
bbox_mapping_back in core/post_processing/merge_augs.py), concatenated and
fused with one class-aware NMS.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.postprocess import batched_nms
from ..data.pipeline import PipelineConfig, preprocess


def tta_variants(img: np.ndarray, scales: Sequence[Tuple[int, int]],
                 flip: bool, base_cfg: PipelineConfig):
    """Produce the (scale x flip) preprocessing variants of one image."""
    out = []
    flips = [False, True] if flip else [False]
    for scale in scales:
        for f in flips:
            cfg = PipelineConfig(img_scale=scale, flip_ratio=1.0 if f else 0.0,
                                 mean=base_cfg.mean, std=base_cfg.std,
                                 max_gt=1, bucket=base_cfg.bucket)
            rng = np.random.RandomState(0) if f else None
            s = preprocess(img, np.zeros((0, 4), np.float32),
                           np.zeros((0,), np.int32), cfg, rng, train=f)
            s["flip"] = f
            out.append(s)
    return out


def map_back(boxes: np.ndarray, scale_factor: np.ndarray, flip: bool,
             img_hw: np.ndarray) -> np.ndarray:
    """Detections in variant coords -> original-image coords."""
    b = boxes.copy()
    if flip:
        w = float(img_hw[1])
        x1 = w - b[:, 2]
        x2 = w - b[:, 0]
        b = np.stack([x1, b[:, 1], x2, b[:, 3]], -1)
    return b / scale_factor[None, :]


def merge_aug_detections(per_variant, nms_iou: float = 0.5,
                         max_per_img: int = 100):
    """per_variant: list of (boxes (k,4) original coords, scores, labels,
    valid). Returns fused (boxes, scores, labels, valid)."""
    boxes = jnp.asarray(np.concatenate([v[0] for v in per_variant]))
    scores = jnp.asarray(np.concatenate([v[1] for v in per_variant]))
    labels = jnp.asarray(np.concatenate([v[2] for v in per_variant]))
    valid = jnp.asarray(np.concatenate([v[3] for v in per_variant]))
    nb, ns, nl, keep, _ = batched_nms(boxes, scores, labels, nms_iou,
                                      max_per_img, valid=valid)
    return (np.asarray(nb), np.asarray(ns), np.asarray(nl),
            np.asarray(keep))

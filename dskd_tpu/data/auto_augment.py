"""AutoAugment for detection (host-side numpy/cv2).

Parity target: mmdet/datasets/pipelines/auto_augment.py (894 LoC) — the
"Learning Data Augmentation Strategies for Object Detection" policy
machinery: a random sub-policy (a short sequence of ops, each with its own
probability and 0-10 level) is applied per image. Geometric ops (Shear,
Rotate, Translate) transform boxes through the same affine map; enhance
ops (Color/Brightness/Contrast, PIL ImageEnhance semantics) and Equalize
touch pixels only. Level maps follow the reference exactly:
level_to_value = level/10 * max (auto_augment.py:14-16),
enhance_level_to_value = level/10 * 1.8 + 0.1 (:19-21), and magnitudes are
negated with probability 0.5 (:24-26).

Images are float RGB in [0, 255]; boxes xyxy; dynamic shapes are fine here
(host code — static padding happens later in the pipeline).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

_MAX_LEVEL = 10


def _affine_boxes(boxes: np.ndarray, m: np.ndarray, w: int, h: int):
    """Map xyxy boxes through a 2x3 affine; return clipped boxes + keep."""
    if len(boxes) == 0:
        return boxes, np.zeros((0,), bool)
    corners = np.stack([
        boxes[:, [0, 1]], boxes[:, [2, 1]],
        boxes[:, [0, 3]], boxes[:, [2, 3]]], axis=1)        # (n, 4, 2)
    ones = np.ones((*corners.shape[:2], 1), corners.dtype)
    mapped = np.concatenate([corners, ones], -1) @ m.T      # (n, 4, 2)
    new = np.concatenate([mapped.min(1), mapped.max(1)], -1)
    new[:, 0::2] = new[:, 0::2].clip(0, w)
    new[:, 1::2] = new[:, 1::2].clip(0, h)
    keep = (new[:, 2] > new[:, 0]) & (new[:, 3] > new[:, 1])
    return new, keep


def _warp(img, m, replace):
    import cv2
    h, w = img.shape[:2]
    return cv2.warpAffine(img, m, (w, h), flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_CONSTANT,
                          borderValue=tuple(float(v) for v in replace))


def _geometric(img, boxes, labels, m, replace):
    h, w = img.shape[:2]
    out = _warp(img, m, replace)
    new_boxes, keep = _affine_boxes(boxes, m, w, h)
    return out, new_boxes[keep], labels[keep]


def shear(img, boxes, labels, magnitude: float, axis: str = "x",
          replace=(128, 128, 128)):
    m = (np.array([[1, magnitude, 0], [0, 1, 0]], np.float32)
         if axis == "x"
         else np.array([[1, 0, 0], [magnitude, 1, 0]], np.float32))
    return _geometric(img, boxes, labels, m, replace)


def rotate(img, boxes, labels, angle: float, replace=(128, 128, 128)):
    import cv2
    h, w = img.shape[:2]
    m = cv2.getRotationMatrix2D(((w - 1) / 2, (h - 1) / 2), angle, 1.0)
    return _geometric(img, boxes, labels, m.astype(np.float32), replace)


def translate(img, boxes, labels, offset: float, axis: str = "x",
              replace=(128, 128, 128)):
    m = (np.array([[1, 0, offset], [0, 1, 0]], np.float32) if axis == "x"
         else np.array([[1, 0, 0], [0, 1, offset]], np.float32))
    return _geometric(img, boxes, labels, m, replace)


def equalize(img):
    """Per-channel histogram equalization (EqualizeTransform)."""
    import cv2
    u8 = np.clip(img, 0, 255).astype(np.uint8)
    out = np.stack([cv2.equalizeHist(u8[..., c]) for c in range(3)], -1)
    return out.astype(np.float32)


def color(img, factor: float):
    """PIL ImageEnhance.Color: blend with the grayscale image."""
    gray = img @ np.array([0.299, 0.587, 0.114], np.float32)
    return np.clip(gray[..., None] + factor * (img - gray[..., None]),
                   0, 255)


def brightness(img, factor: float):
    return np.clip(img * factor, 0, 255)


def contrast(img, factor: float):
    mean = img.mean()
    return np.clip(mean + factor * (img - mean), 0, 255)


def level_to_value(level, max_value):
    return level / _MAX_LEVEL * max_value


def enhance_level_to_value(level, a=1.8, b=0.1):
    return level / _MAX_LEVEL * a + b


# default policy set: geometric + color pairs in the spirit of the paper's
# v0 policies, expressed with the ops above (the reference leaves the
# policy list to configs — auto_augment.py Examples block)
DEFAULT_POLICIES: List[List[dict]] = [
    [dict(type="Shear", prob=0.4, level=5, axis="x"),
     dict(type="Color", prob=0.6, level=6)],
    [dict(type="Rotate", prob=0.6, level=8),
     dict(type="Equalize", prob=0.8, level=0)],
    [dict(type="TranslateY", prob=0.6, level=6),
     dict(type="Brightness", prob=0.4, level=4)],
    [dict(type="Rotate", prob=0.4, level=4),
     dict(type="Contrast", prob=0.6, level=5)],
    [dict(type="TranslateX", prob=0.6, level=4),
     dict(type="Shear", prob=0.4, level=3, axis="y")],
]


def _apply_op(op: dict, img, boxes, labels, rng) -> Tuple:
    if rng.rand() > op.get("prob", 0.5):
        return img, boxes, labels
    t = op["type"]
    level = op.get("level", 5)
    neg = -1.0 if rng.rand() < 0.5 else 1.0
    if t == "Shear":
        return shear(img, boxes, labels,
                     neg * level_to_value(level, 0.3),
                     axis=op.get("axis", "x"))
    if t == "Rotate":
        return rotate(img, boxes, labels, neg * level_to_value(level, 30.0))
    if t in ("TranslateX", "TranslateY"):
        axis = "x" if t == "TranslateX" else "y"
        size = img.shape[1] if axis == "x" else img.shape[0]
        off = neg * level_to_value(level, 0.25) * size
        return translate(img, boxes, labels, off, axis=axis)
    if t == "Equalize":
        return equalize(img), boxes, labels
    if t == "Color":
        return color(img, enhance_level_to_value(level)), boxes, labels
    if t == "Brightness":
        return brightness(img, enhance_level_to_value(level)), boxes, labels
    if t == "Contrast":
        return contrast(img, enhance_level_to_value(level)), boxes, labels
    raise ValueError(f"unknown autoaugment op {t!r}")


def auto_augment(img: np.ndarray, boxes: np.ndarray, labels: np.ndarray,
                 rng: np.random.RandomState,
                 policies: Optional[Sequence[Sequence[dict]]] = None):
    """Apply one randomly chosen sub-policy (AutoAugment.__call__)."""
    policies = policies if policies is not None else DEFAULT_POLICIES
    sub = policies[rng.randint(len(policies))]
    for op in sub:
        img, boxes, labels = _apply_op(op, img, boxes, labels, rng)
    return img, boxes, labels

"""Multi-image mix transforms: Mosaic and MixUp (host-side numpy).

Parity targets (behavior re-derived, not transcribed):
  * Mosaic — mmdet/datasets/pipelines/transforms.py:1948-2216: paste four
    keep-ratio-resized images around a random center in a 2x-scale canvas
    (pad 114), shift each sub-image's boxes by (paste - crop) offset, clip
    to the canvas, drop boxes fully outside.
  * MixUp — transforms.py:2219-2443: keep-ratio resize the retrieved image
    into ``dynamic_scale``, scale-jitter, optional horizontal flip, random
    crop to the target image's size, then blend 0.5/0.5 and append the
    retrieved (shifted, clipped) boxes.
  * MultiImageMixDataset — dataset_wrappers.py: the transform draws the
    extra images itself; here the DataLoader passes a ``get_sample(idx)``
    callback instead of a dataset wrapper class.
"""
from __future__ import annotations

from typing import Callable, List, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

PAD_VAL = 114


def _keep_ratio_resize(img: np.ndarray, scale_hw: Tuple[int, int]):
    h, w = img.shape[:2]
    r = min(scale_hw[0] / h, scale_hw[1] / w)
    out = cv2.resize(img, (int(w * r), int(h * r)),
                     interpolation=cv2.INTER_LINEAR)
    return out, r


def mosaic(samples: List[Tuple[np.ndarray, np.ndarray, np.ndarray]],
           img_scale: Tuple[int, int], rng: np.random.RandomState,
           center_ratio_range=(0.5, 1.5), min_bbox_size: float = 0.0):
    """Compose 4 (image, boxes (n,4) xyxy, labels (n,)) samples into one
    (2*H, 2*W) mosaic. Returns (img, boxes, labels)."""
    H, W = img_scale
    canvas = np.full((2 * H, 2 * W, 3), PAD_VAL, np.uint8)
    cx = int(rng.uniform(*center_ratio_range) * W)
    cy = int(rng.uniform(*center_ratio_range) * H)

    out_boxes, out_labels = [], []
    for i, (img, boxes, labels) in enumerate(samples[:4]):
        im, r = _keep_ratio_resize(img, (H, W))
        h, w = im.shape[:2]
        if i == 0:      # top_left: right/bottom edges at the center
            x1, y1 = max(cx - w, 0), max(cy - h, 0)
            x2, y2 = cx, cy
            cx1, cy1 = w - (x2 - x1), h - (y2 - y1)
        elif i == 1:    # top_right
            x1, y1 = cx, max(cy - h, 0)
            x2, y2 = min(cx + w, 2 * W), cy
            cx1, cy1 = 0, h - (y2 - y1)
        elif i == 2:    # bottom_left
            x1, y1 = max(cx - w, 0), cy
            x2, y2 = cx, min(2 * H, cy + h)
            cx1, cy1 = w - (x2 - x1), 0
        else:           # bottom_right
            x1, y1 = cx, cy
            x2, y2 = min(cx + w, 2 * W), min(2 * H, cy + h)
            cx1, cy1 = 0, 0
        canvas[y1:y2, x1:x2] = im[cy1:cy1 + (y2 - y1), cx1:cx1 + (x2 - x1)]

        if len(boxes):
            b = boxes.astype(np.float32) * r
            b[:, 0::2] += x1 - cx1
            b[:, 1::2] += y1 - cy1
            out_boxes.append(b)
            out_labels.append(labels)

    if out_boxes:
        boxes = np.concatenate(out_boxes, 0)
        labels = np.concatenate(out_labels, 0)
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, 2 * W)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, 2 * H)
        wh_ok = ((boxes[:, 2] - boxes[:, 0] > min_bbox_size)
                 & (boxes[:, 3] - boxes[:, 1] > min_bbox_size))
        boxes, labels = boxes[wh_ok], labels[wh_ok]
    else:
        boxes = np.empty((0, 4), np.float32)
        labels = np.empty((0,), np.int32)
    return canvas, boxes, labels


def mixup(img: np.ndarray, boxes: np.ndarray, labels: np.ndarray,
          r_img: np.ndarray, r_boxes: np.ndarray, r_labels: np.ndarray,
          rng: np.random.RandomState, dynamic_scale=(640, 640),
          ratio_range=(0.5, 1.5), flip_ratio: float = 0.5):
    """Blend a retrieved sample into ``img`` (0.5/0.5), appending the
    retrieved boxes (scaled / jittered / flipped / cropped)."""
    if len(r_boxes) == 0:
        return img, boxes, labels

    jit = rng.uniform(*ratio_range)
    do_flip = rng.uniform(0, 1) > flip_ratio

    out, r = _keep_ratio_resize(r_img, dynamic_scale)
    pad = np.full((dynamic_scale[0], dynamic_scale[1], 3), PAD_VAL, np.uint8)
    pad[:out.shape[0], :out.shape[1]] = out
    out = cv2.resize(pad, (int(pad.shape[1] * jit), int(pad.shape[0] * jit)),
                     interpolation=cv2.INTER_LINEAR)
    r *= jit
    if do_flip:
        out = out[:, ::-1]

    oh, ow = out.shape[:2]
    th, tw = img.shape[:2]
    padded = np.zeros((max(oh, th), max(ow, tw), 3), np.uint8)
    padded[:oh, :ow] = out
    y_off = rng.randint(0, padded.shape[0] - th + 1) \
        if padded.shape[0] > th else 0
    x_off = rng.randint(0, padded.shape[1] - tw + 1) \
        if padded.shape[1] > tw else 0
    crop = padded[y_off:y_off + th, x_off:x_off + tw]

    b = r_boxes.astype(np.float32) * r
    b[:, 0::2] = np.clip(b[:, 0::2], 0, ow)
    b[:, 1::2] = np.clip(b[:, 1::2], 0, oh)
    if do_flip:
        b[:, 0::2] = ow - b[:, 0::2][:, ::-1]
    b[:, 0::2] = np.clip(b[:, 0::2] - x_off, 0, tw)
    b[:, 1::2] = np.clip(b[:, 1::2] - y_off, 0, th)
    keep = (b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1])

    mixed = (0.5 * img.astype(np.float32)
             + 0.5 * crop.astype(np.float32)).astype(img.dtype)
    return (mixed, np.concatenate([boxes.reshape(-1, 4), b[keep]], 0),
            np.concatenate([labels.reshape(-1), r_labels[keep]], 0))

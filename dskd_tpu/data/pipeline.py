"""Image preprocessing pipeline (host side, numpy/cv2).

Parity target: the flagship train pipeline
(configs/deformable_detr/chaosuan_*_il.py:157-170): LoadImageFromFile ->
LoadAnnotations -> RandomFlip(0.5) -> Resize((640,640), keep_ratio=True) ->
Normalize(COCO mean/std, to_rgb) -> Pad -> Collect. NOTE the flagship config
flips BEFORE resizing (unlike stock mmdet) — order preserved.

TPU-native shape discipline: instead of the reference's pad-to-divisor +
DataContainer ragged batching, every image lands in a single static
(bucket_h, bucket_w) canvas and GT pads to ``max_gt`` with a validity mask,
so one compiled step serves the whole epoch.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMAGENET_STD = np.array([58.395, 57.12, 57.375], np.float32)


@dataclass
class PipelineConfig:
    img_scale: Tuple[int, int] = (640, 640)   # (max_long, max_short) bucket
    # multi-scale training: list of scales sampled per image
    # (Resize multiscale_mode='value'); bucket must cover the largest
    multi_scales: Optional[Tuple[Tuple[int, int], ...]] = None
    keep_ratio: bool = True
    flip_ratio: float = 0.5
    mean: np.ndarray = field(default_factory=lambda: IMAGENET_MEAN.copy())
    std: np.ndarray = field(default_factory=lambda: IMAGENET_STD.copy())
    max_gt: int = 100
    bucket: Tuple[int, int] = (640, 640)      # static padded canvas (H, W)
    photo_metric_distortion: bool = False
    # multi-image mixes (MultiImageMixDataset equivalents; train only)
    mosaic: bool = False
    mosaic_center_ratio: Tuple[float, float] = (0.5, 1.5)
    mixup: bool = False
    mixup_ratio_range: Tuple[float, float] = (0.5, 1.5)
    # SSD geometric recipe (pipelines/transforms.py Expand +
    # MinIoURandomCrop, configs/ssd/ssd300_coco.py train pipeline);
    # box-only transforms (incompatible with with_mask/with_semantic)
    expand: bool = False
    expand_ratio_range: Tuple[float, float] = (1.0, 4.0)
    min_iou_crop: bool = False
    min_ious: Tuple[float, ...] = (0.1, 0.3, 0.5, 0.7, 0.9)
    min_crop_size: float = 0.3
    # large-scale jitter (configs/strong_baselines: Resize
    # ratio_range=(0.1, 2.0) 'range' mode + RandomCrop to a fixed
    # canvas); masks/semantic follow the crop via batch_gt_masks'
    # crop_offset
    resize_ratio_range: Optional[Tuple[float, float]] = None
    random_crop: Optional[Tuple[int, int]] = None   # (h, w) crop_size
    # robustness benchmarking (the reference's Corrupt transform):
    # (corruption_name, severity 1-5) applied to the raw image
    corruption: Optional[Tuple[str, int]] = None
    # AutoAugment detection policies (pipelines/auto_augment.py); True uses
    # the built-in default policy set, or pass an explicit policy list
    auto_augment: object = False
    # instance masks (LoadAnnotations with_mask=True): rasterize GT
    # segmentations to (max_gt, H/mask_stride, W/mask_stride) bitmaps;
    # incompatible with mosaic/mixup/auto_augment (box-only transforms)
    with_mask: bool = False
    mask_stride: int = 4
    # per-pixel semantic GT (LoadPanopticAnnotations with_seg=True):
    # (H/mask_stride, W/mask_stride) int32 contiguous labels, 255 = void
    with_semantic: bool = False


def rescale_size(h: int, w: int, scale: Tuple[int, int]) -> Tuple[int, int, float]:
    """mmdet Resize keep_ratio semantics: fit (h, w) into ``scale``."""
    max_long, max_short = max(scale), min(scale)
    f = min(max_long / max(h, w), max_short / min(h, w))
    return int(h * f + 0.5), int(w * f + 0.5), f


def load_image(path: str) -> np.ndarray:
    """BGR file -> RGB float array (the reference's to_rgb=True)."""
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def photo_metric_distortion(img: np.ndarray, rng,
                            brightness_delta: float = 32,
                            contrast_range=(0.5, 1.5),
                            saturation_range=(0.5, 1.5),
                            hue_delta: int = 18) -> np.ndarray:
    """PhotoMetricDistortion (pipelines/transforms.py): random brightness,
    contrast (random order), saturation and hue in HSV space."""
    img = img.astype(np.float32)
    if rng.randint(2):
        img = img + rng.uniform(-brightness_delta, brightness_delta)
    contrast_first = rng.randint(2)
    if contrast_first and rng.randint(2):
        img = img * rng.uniform(*contrast_range)
    hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                       cv2.COLOR_RGB2HSV).astype(np.float32)
    if rng.randint(2):
        hsv[..., 1] = np.clip(hsv[..., 1] * rng.uniform(*saturation_range),
                              0, 255)
    if rng.randint(2):
        hsv[..., 0] = (hsv[..., 0] + rng.uniform(-hue_delta, hue_delta)) % 180
    img = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB).astype(
        np.float32)
    if not contrast_first and rng.randint(2):
        img = img * rng.uniform(*contrast_range)
    return np.clip(img, 0, 255)


def expand_image(img, boxes, rng, mean, ratio_range=(1.0, 4.0)):
    """Expand (pipelines/transforms.py Expand, prob=0.5): paste the image
    at a random offset inside a mean-filled canvas up to ratio_range[1]
    times larger; boxes shift by the offset. Zooms OUT so the following
    MinIoURandomCrop can zoom back in at varied object scales."""
    if rng.randint(2):
        return img, boxes
    h, w = img.shape[:2]
    ratio = rng.uniform(*ratio_range)
    eh, ew = int(h * ratio), int(w * ratio)
    canvas = np.empty((eh, ew, 3), img.dtype)
    canvas[...] = np.asarray(mean, img.dtype)
    top = rng.randint(0, eh - h + 1)
    left = rng.randint(0, ew - w + 1)
    canvas[top:top + h, left:left + w] = img
    if len(boxes):
        boxes = boxes + np.array([left, top, left, top], boxes.dtype)
    return canvas, boxes


def min_iou_random_crop(img, boxes, labels, rng,
                        min_ious=(0.1, 0.3, 0.5, 0.7, 0.9),
                        min_crop_size=0.3, max_rounds: int = 20):
    """MinIoURandomCrop (pipelines/transforms.py): sample a mode from
    (keep-original, *min_ious, any-overlap); for a crop mode, try 50
    random patches (aspect in [0.5, 2], side >= min_crop_size) until
    every GT's IoU with the patch clears the mode's threshold; keep only
    boxes whose centers fall inside, clipped and shifted.

    The reference loops modes forever; this bounds the outer loop at
    ``max_rounds`` and returns the original sample if nothing qualifies
    (a conscious liveness deviation — reachable only on pathological
    geometry)."""
    h, w = img.shape[:2]
    sample_modes = (1,) + tuple(min_ious) + (0,)
    for _ in range(max_rounds):
        mode = sample_modes[rng.randint(len(sample_modes))]
        if mode == 1:
            return img, boxes, labels
        min_iou = float(mode)
        for _ in range(50):
            new_w = rng.uniform(min_crop_size * w, w)
            new_h = rng.uniform(min_crop_size * h, h)
            if new_h / new_w < 0.5 or new_h / new_w > 2:
                continue
            left = rng.uniform(0, w - new_w)
            top = rng.uniform(0, h - new_h)
            # integer patch from the start (the reference rounds before
            # the IoU test, so box IoUs see the actual crop window)
            patch = np.array([int(left), int(top), int(left + new_w),
                              int(top + new_h)], np.float32)
            if patch[2] <= patch[0] or patch[3] <= patch[1]:
                continue
            if len(boxes):
                ix1 = np.maximum(boxes[:, 0], patch[0])
                iy1 = np.maximum(boxes[:, 1], patch[1])
                ix2 = np.minimum(boxes[:, 2], patch[2])
                iy2 = np.minimum(boxes[:, 3], patch[3])
                inter = (np.clip(ix2 - ix1, 0, None)
                         * np.clip(iy2 - iy1, 0, None))
                area = ((boxes[:, 2] - boxes[:, 0])
                        * (boxes[:, 3] - boxes[:, 1]))
                patch_area = ((patch[2] - patch[0])
                              * (patch[3] - patch[1]))
                # TRUE IoU of patch vs box (the reference's
                # bbox_overlaps mode='iou'), not inter-over-box-area
                iou = inter / np.maximum(
                    area + patch_area - inter, 1e-10)
                if len(iou) and iou.min() < min_iou:
                    continue
                cx = (boxes[:, 0] + boxes[:, 2]) / 2
                cy = (boxes[:, 1] + boxes[:, 3]) / 2
                keep = ((cx > patch[0]) & (cy > patch[1])
                        & (cx < patch[2]) & (cy < patch[3]))
                if not keep.any():
                    continue
                nb = boxes[keep].copy()
                nb[:, 0::2] = nb[:, 0::2].clip(patch[0], patch[2])
                nb[:, 1::2] = nb[:, 1::2].clip(patch[1], patch[3])
                nb -= np.array([patch[0], patch[1], patch[0], patch[1]],
                               nb.dtype)
                boxes, labels = nb, labels[keep]
            img = img[int(patch[1]):int(patch[3]),
                      int(patch[0]):int(patch[2])]
            return img, boxes, labels
    return img, boxes, labels


def random_crop(img, boxes, labels, rng, crop_size, return_meta=False):
    """RandomCrop with allow_negative_crop=True (pipelines/transforms.py;
    the LSJ companion crop): uniform offset, boxes shifted + clipped,
    boxes that collapse to zero extent dropped.

    ``return_meta`` additionally returns (keep_idx, (top, left)) so mask
    and semantic payloads can follow the same crop."""
    h, w = img.shape[:2]
    ch = min(crop_size[0], h)
    cw = min(crop_size[1], w)
    top = rng.randint(0, h - ch + 1)
    left = rng.randint(0, w - cw + 1)
    img = img[top:top + ch, left:left + cw]
    keep_idx = np.arange(len(boxes))
    if len(boxes):
        nb = boxes - np.array([left, top, left, top], boxes.dtype)
        nb[:, 0::2] = nb[:, 0::2].clip(0, cw)
        nb[:, 1::2] = nb[:, 1::2].clip(0, ch)
        keep = (nb[:, 2] > nb[:, 0]) & (nb[:, 3] > nb[:, 1])
        boxes, labels = nb[keep], labels[keep]
        keep_idx = np.flatnonzero(keep)
    if return_meta:
        return img, boxes, labels, keep_idx, (top, left)
    return img, boxes, labels


def preprocess(img: np.ndarray, boxes: np.ndarray, labels: np.ndarray,
               cfg: PipelineConfig, rng: Optional[np.random.RandomState],
               train: bool = True, segmentations=None, semantic=None):
    """One sample -> static-shape tensors.

    Returns dict(image (H, W, 3) f32, img_hw (2,) i32 valid shape,
    gt_bboxes (max_gt, 4), gt_labels (max_gt,), gt_valid (max_gt,),
    scale_factor (4,) f32, ori_hw (2,) i32, flip bool); plus gt_masks
    (max_gt, H/mask_stride, W/mask_stride) f32 when cfg.with_mask and
    gt_semantic (H/mask_stride, W/mask_stride) i32 when
    cfg.with_semantic (``semantic``: (h0, w0) label map, 255 = void).
    """
    h0, w0 = img.shape[:2]
    if cfg.corruption is not None:
        from .corruptions import corrupt
        img = corrupt(img, cfg.corruption[0], cfg.corruption[1])
    if train and rng is not None and cfg.auto_augment:
        from .auto_augment import auto_augment
        policies = (None if cfg.auto_augment is True
                    else cfg.auto_augment)
        img, boxes, labels = auto_augment(
            img.astype(np.float32), np.asarray(boxes, np.float32),
            np.asarray(labels), rng, policies)
    if train and rng is not None and cfg.photo_metric_distortion:
        img = photo_metric_distortion(img, rng)
    if train and rng is not None and cfg.expand:
        assert not (cfg.with_mask or cfg.with_semantic), \
            "expand is box-only"
        img, boxes = expand_image(img, np.asarray(boxes, np.float32),
                                  rng, cfg.mean, cfg.expand_ratio_range)
        h0, w0 = img.shape[:2]
    if train and rng is not None and cfg.min_iou_crop:
        assert not (cfg.with_mask or cfg.with_semantic), \
            "min_iou_crop is box-only"
        img, boxes, labels = min_iou_random_crop(
            img, np.asarray(boxes, np.float32), np.asarray(labels),
            rng, cfg.min_ious, cfg.min_crop_size)
        h0, w0 = img.shape[:2]
    flip = bool(train and rng is not None
                and rng.rand() < cfg.flip_ratio)
    if flip:
        img = img[:, ::-1]
        if len(boxes):
            x1 = w0 - boxes[:, 2]
            x2 = w0 - boxes[:, 0]
            boxes = np.stack([x1, boxes[:, 1], x2, boxes[:, 3]], -1)

    scale = cfg.img_scale
    if train and rng is not None and cfg.multi_scales:
        scale = cfg.multi_scales[rng.randint(len(cfg.multi_scales))]
    if train and rng is not None and cfg.resize_ratio_range:
        # Resize ratio_range 'range' mode (the LSJ half of
        # configs/strong_baselines): one uniform ratio scales img_scale
        r = rng.uniform(*cfg.resize_ratio_range)
        scale = (max(int(scale[0] * r), 1), max(int(scale[1] * r), 1))
    new_h, new_w, _ = rescale_size(h0, w0, scale)
    img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    w_scale, h_scale = new_w / w0, new_h / h0
    scale_factor = np.array([w_scale, h_scale, w_scale, h_scale], np.float32)
    if len(boxes):
        boxes = boxes * scale_factor
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, new_w)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, new_h)
    crop_top = crop_left = 0
    if train and rng is not None and cfg.random_crop:
        img, boxes, labels, keep_idx, (crop_top, crop_left) = random_crop(
            img, np.asarray(boxes, np.float32), np.asarray(labels),
            rng, cfg.random_crop, return_meta=True)
        new_h, new_w = img.shape[:2]
        if segmentations is not None:
            segmentations = [segmentations[i] for i in keep_idx
                             if i < len(segmentations)]

    img = (img.astype(np.float32) - cfg.mean) / cfg.std

    H, W = cfg.bucket
    canvas = np.zeros((H, W, 3), np.float32)
    canvas[:new_h, :new_w] = img[:H, :W]

    n = min(len(boxes), cfg.max_gt)
    gt_bboxes = np.zeros((cfg.max_gt, 4), np.float32)
    gt_labels = np.zeros((cfg.max_gt,), np.int32)
    gt_valid = np.zeros((cfg.max_gt,), bool)
    gt_bboxes[:n] = boxes[:n]
    gt_labels[:n] = labels[:n]
    gt_valid[:n] = True

    out = dict(image=canvas,
               img_hw=np.array([new_h, new_w], np.int32),
               gt_bboxes=gt_bboxes, gt_labels=gt_labels, gt_valid=gt_valid,
               scale_factor=scale_factor,
               ori_hw=np.array([h0, w0], np.int32), flip=flip)
    if cfg.with_mask:
        from .masks import batch_gt_masks
        out["gt_masks"] = batch_gt_masks(
            segmentations if segmentations is not None else [],
            (h0, w0), (h_scale, w_scale), (H, W), cfg.max_gt,
            mask_stride=cfg.mask_stride, flip=flip,
            crop_offset=(crop_top, crop_left), valid_hw=(new_h, new_w))
    if cfg.with_semantic:
        st = cfg.mask_stride
        hs, ws = H // st, W // st
        sem = np.full((hs, ws), 255, np.int32)
        if semantic is not None:
            from .masks import canvas_to_source_grid
            s0 = semantic[:, ::-1] if flip else semantic
            ys, xs, vy, vx = canvas_to_source_grid(
                (H, W), st, (h0, w0), (h_scale, w_scale),
                (crop_top, crop_left), (new_h, new_w))
            grid = s0[ys][:, xs].astype(np.int32)
            sem = np.where(vy[:, None] & vx[None, :], grid, 255)
        out["gt_semantic"] = sem
    return out

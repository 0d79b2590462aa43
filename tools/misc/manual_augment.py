#!/usr/bin/env python
"""Hand-tunable augmentation presets + single-image A/B
(parity: tools/misc_my/manual_augment.py + get_dataset_augment_cfg.py —
the reference's albumentations preset catalog used by its augmentation
checkers; here the presets are PipelineConfig recipes over this repo's
own transforms, plus the gated albu bridge)."""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def get_manual_augment(which: str = "v1"):
    """Preset PipelineConfig variants mirroring the reference's v1/v2/v3
    albumentations ladders (geometric -> photometric -> mixing)."""
    from dskd_tpu.data.pipeline import PipelineConfig

    presets = {
        # v1: geometric only (resize + flip)
        "v1": PipelineConfig(flip_ratio=0.5),
        # v2: + photometric distortion (the SSD/YOLO color jitter)
        "v2": PipelineConfig(flip_ratio=0.5,
                             photo_metric_distortion=True),
        # v3: + multi-scale and mixing (Mosaic/MixUp)
        "v3": PipelineConfig(flip_ratio=0.5,
                             photo_metric_distortion=True,
                             multi_scales=((608, 608), (640, 640)),
                             mosaic=True, mixup=True),
        # v4: AutoAugment policy v1 (data/auto_augment.py)
        "v4": PipelineConfig(flip_ratio=0.5, auto_augment="v1"),
    }
    return presets[which]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("image")
    parser.add_argument("--which", default="v2",
                        choices=("v1", "v2", "v3", "v4"))
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default="manual_augment.jpg")
    args = parser.parse_args()

    import cv2

    from dskd_tpu.data.pipeline import (IMAGENET_MEAN, IMAGENET_STD,
                                        load_image, preprocess)
    from stich_imgs import stich_many_imgs

    img = load_image(args.image)
    boxes = np.zeros((0, 4), np.float32)
    labels = np.zeros((0,), np.int32)
    pipe = get_manual_augment(args.which)
    rng = np.random.RandomState(args.seed)
    out = preprocess(img, boxes, labels, pipe, rng, True)
    aug = ((out["image"] * IMAGENET_STD + IMAGENET_MEAN)
           .clip(0, 255).astype(np.uint8))
    tiled = stich_many_imgs([img.astype(np.uint8), aug])
    cv2.imwrite(args.out, cv2.cvtColor(tiled, cv2.COLOR_RGB2BGR))
    print(f"preset {args.which}: wrote {args.out}")


if __name__ == "__main__":
    main()

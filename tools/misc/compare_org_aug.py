#!/usr/bin/env python
"""Compare annotations before/after the train pipeline on dataset samples
(parity: tools/misc_my/compare_org_aug_annotation.py /
compare_org_aug_detection.py / check_dataset_augment.py — the reference's
side-by-side augmentation checkers). Writes [original | augmented] tiles
with GT boxes drawn on both."""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--task", type=int, default=1)
    parser.add_argument("--num", type=int, default=5)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output-dir", default="compare_aug_out")
    args = parser.parse_args()

    import cv2

    from dskd_tpu.data.pipeline import (IMAGENET_MEAN, IMAGENET_STD,
                                        PipelineConfig, load_image,
                                        preprocess)
    from dskd_tpu.train.incremental import make_datasets
    from dskd_tpu.utils.config import load_config
    from stich_imgs import stich_many_imgs

    cfg = load_config(args.config)
    ds, _ = make_datasets(cfg, args.task, len(cfg.data.catsplit))
    pipe = PipelineConfig(
        img_scale=cfg.data.img_scale, flip_ratio=cfg.data.flip_ratio,
        max_gt=cfg.data.max_gt, bucket=cfg.data.bucket,
        multi_scales=cfg.data.multi_scales,
        photo_metric_distortion=cfg.data.photo_metric_distortion,
        auto_augment=cfg.data.auto_augment)
    os.makedirs(args.output_dir, exist_ok=True)
    rng = np.random.RandomState(args.seed)

    def draw(img, boxes, labels, valid=None, color=(0, 255, 0)):
        img = img.copy()
        for i, (b, l) in enumerate(zip(boxes, labels)):
            if valid is not None and not valid[i]:
                continue
            cv2.rectangle(img, (int(b[0]), int(b[1])),
                          (int(b[2]), int(b[3])), color, 2)
            cv2.putText(img, ds.CLASSES[int(l)],
                        (int(b[0]), max(int(b[1]) - 3, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
        return img

    for i in range(min(args.num, len(ds))):
        path, _, boxes, labels, img_id = ds.get_raw(i)
        raw = load_image(path)
        org = draw(raw.astype(np.uint8), boxes, labels)
        out = preprocess(raw, boxes, labels, pipe, rng, True)
        aug_img = ((out["image"] * IMAGENET_STD + IMAGENET_MEAN)
                   .clip(0, 255).astype(np.uint8))
        aug = draw(aug_img, out["gt_bboxes"], out["gt_labels"],
                   out["gt_valid"], color=(255, 64, 0))
        tiled = stich_many_imgs([org, aug], cols=2)
        dst = os.path.join(args.output_dir, f"{img_id}.jpg")
        cv2.imwrite(dst, cv2.cvtColor(tiled, cv2.COLOR_RGB2BGR))
        print("wrote", dst)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Visualize dataset samples after the train pipeline (parity:
tools/misc/browse_dataset.py) — writes annotated images to --output-dir."""
import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--task", type=int, default=1)
    parser.add_argument("--num", type=int, default=10)
    parser.add_argument("--output-dir", default="browse_out")
    args = parser.parse_args()

    import cv2

    from dskd_tpu.data.pipeline import (IMAGENET_MEAN, IMAGENET_STD,
                                        PipelineConfig, load_image,
                                        preprocess)
    from dskd_tpu.train.incremental import make_datasets
    from dskd_tpu.utils.config import load_config

    cfg = load_config(args.config)
    ds, _ = make_datasets(cfg, args.task, len(cfg.data.catsplit))
    pipe = PipelineConfig(img_scale=cfg.data.img_scale,
                          flip_ratio=cfg.data.flip_ratio,
                          max_gt=cfg.data.max_gt, bucket=cfg.data.bucket)
    os.makedirs(args.output_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(min(args.num, len(ds))):
        path, _, boxes, labels, img_id = ds.get_raw(i)
        out = preprocess(load_image(path), boxes, labels, pipe, rng, True)
        img = (out["image"] * IMAGENET_STD + IMAGENET_MEAN).clip(0, 255)
        img = img.astype(np.uint8).copy()
        for b, l, v in zip(out["gt_bboxes"], out["gt_labels"],
                           out["gt_valid"]):
            if not v:
                continue
            cv2.rectangle(img, (int(b[0]), int(b[1])),
                          (int(b[2]), int(b[3])), (0, 255, 0), 2)
            cv2.putText(img, ds.CLASSES[int(l)], (int(b[0]), int(b[1]) - 3),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
        cv2.imwrite(os.path.join(args.output_dir, f"{img_id}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    print(f"wrote {min(args.num, len(ds))} images to {args.output_dir}")


if __name__ == "__main__":
    main()

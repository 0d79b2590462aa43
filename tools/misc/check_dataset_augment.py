#!/usr/bin/env python
"""Show original vs pipeline-augmented samples side by side (parity:
tools/misc_my/check_dataset_augment.py — the reference iterates the
built train dataset and displays the raw and transformed image pair;
here both are written into --output-dir as <id>_orig / <id>_aug).

--manual-aug applies one of the manual_augment.py recipes (v0-v3) on
top of the config's pipeline, matching the reference's knob.
"""
import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("--trainval", default="train",
                   choices=("train", "val"))
    p.add_argument("--task", type=int, default=1)
    p.add_argument("--num", type=int, default=10)
    p.add_argument("--manual-aug", default=None,
                   help="v0|v1|v2|v3 from tools/misc/manual_augment.py")
    p.add_argument("--shuffle-img", action="store_true")
    p.add_argument("--output-dir", default="augment_out")
    args = p.parse_args()

    import cv2

    from dskd_tpu.data.pipeline import (IMAGENET_MEAN, IMAGENET_STD,
                                        PipelineConfig, load_image,
                                        preprocess)
    from dskd_tpu.train.incremental import make_datasets
    from dskd_tpu.utils.config import load_config
    from dskd_tpu.utils.visualization import imshow_det_bboxes

    cfg = load_config(args.config)
    train_ds, val_ds = make_datasets(cfg, args.task,
                                     len(cfg.data.catsplit))
    ds = train_ds if args.trainval == "train" else val_ds
    if args.manual_aug:
        # preset PipelineConfig ladder (v1 geometric ... v4 autoaugment)
        import sys
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from manual_augment import get_manual_augment
        pipe = get_manual_augment(args.manual_aug)
    else:
        pipe = PipelineConfig(img_scale=cfg.data.img_scale,
                              flip_ratio=cfg.data.flip_ratio,
                              max_gt=cfg.data.max_gt,
                              bucket=cfg.data.bucket)

    os.makedirs(args.output_dir, exist_ok=True)
    idxs = np.arange(len(ds))
    rng = np.random.RandomState(0)
    if args.shuffle_img:
        rng.shuffle(idxs)
    for i in idxs[:args.num]:
        path, _, boxes, labels, img_id = ds.get_raw(int(i))
        raw = load_image(path)
        imshow_det_bboxes(
            raw.astype(np.uint8), boxes, labels, class_names=ds.CLASSES,
            out_file=os.path.join(args.output_dir, f"{img_id}_orig.jpg"))
        out = preprocess(raw, boxes, labels, pipe, rng,
                         args.trainval == "train")
        aug = (out["image"] * IMAGENET_STD + IMAGENET_MEAN).clip(0, 255)
        keep = out["gt_valid"]
        imshow_det_bboxes(
            aug.astype(np.uint8), out["gt_bboxes"][keep],
            out["gt_labels"][keep], class_names=ds.CLASSES,
            out_file=os.path.join(args.output_dir, f"{img_id}_aug.jpg"))
    print(f"wrote {min(args.num, len(ds))} orig/aug pairs to "
          f"{args.output_dir}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Non-IL confusion matrix from saved detection results (parity:
tools/analysis_tools/confusion_matrix.py — calculate_confusion_matrix
at :60, per-image analysis at :96, plot at :146). Consumes the COCO
results json `tools/test.py --out` writes plus the dataset from the
config; the IL variant (confusion_matrix_il.py) instead runs inference
itself on the task split.
"""
import argparse
import json
from collections import defaultdict

import numpy as np

from confusion_matrix_il import (calculate_confusion_matrix,
                                 plot_confusion_matrix)


def group_results(results, num_classes, catid_to_label, img_ids):
    """COCO results json -> per-image per-class (n, 5) arrays (the
    bbox2result layout calculate_confusion_matrix consumes)."""
    per_img = defaultdict(lambda: [[] for _ in range(num_classes)])
    for r in results:
        lab = catid_to_label[r["category_id"]]
        x, y, w, h = r["bbox"]
        per_img[r["image_id"]][lab].append(
            [x, y, x + w, y + h, r["score"]])
    dets = []
    for i in img_ids:
        dets.append([np.array(c, np.float32).reshape(-1, 5)
                     for c in per_img[i]])
    return dets


def main():
    parser = argparse.ArgumentParser(
        description="confusion matrix from a results json")
    parser.add_argument("config", help="config file path")
    parser.add_argument("prediction_path",
                        help="results json from tools/test.py --out")
    parser.add_argument("--score-thr", type=float, default=0.3)
    parser.add_argument("--tp-iou-thr", type=float, default=0.5)
    parser.add_argument("--out", default="confusion_matrix.png")
    parser.add_argument("--no-norm", action="store_true",
                        help="plot raw counts instead of row-normalized")
    args = parser.parse_args()

    from dskd_tpu.train.incremental import make_datasets
    from dskd_tpu.utils.config import load_config

    cfg = load_config(args.config)
    task_nums = len(cfg.data.catsplit)
    _, val_ds = make_datasets(cfg, task_nums, task_nums)

    with open(args.prediction_path) as f:
        results = json.load(f)

    num_classes = cfg.model.num_classes
    gts, img_ids = [], []
    for i in range(len(val_ds)):
        _, _, boxes, labels, img_id = val_ds.get_raw(i)
        gts.append((boxes, labels))
        img_ids.append(img_id)
    dets = group_results(results, num_classes, val_ds.cat2label, img_ids)

    cm = calculate_confusion_matrix(gts, dets, num_classes,
                                    args.score_thr, args.tp_iou_thr)
    plot_confusion_matrix(cm, val_ds.CLASSES, args.out,
                          normalize=not args.no_norm)
    np.save(args.out.rsplit(".", 1)[0] + ".npy", cm)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Draw COCO-format GT boxes (and optionally a results json) on an image —
the reference's tools/misc_my/show_boxes_on_img.py debug helper.

Usage:
  python tools/misc/show_boxes_on_img.py IMG --ann ANN.json \
      [--results RES.json] [--score-thr 0.3] [--out out.png]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from dskd_tpu.utils.visualization import (imshow_det_bboxes,  # noqa: E402
                                          imshow_gt_det_bboxes)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("img")
    p.add_argument("--ann", required=True)
    p.add_argument("--results", default=None,
                   help="COCO results json: draws GT|detections side by side")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--out", default="boxes.png")
    args = p.parse_args()

    import cv2

    arr = cv2.cvtColor(cv2.imread(args.img), cv2.COLOR_BGR2RGB)
    with open(args.ann) as f:
        ann = json.load(f)
    base = os.path.basename(args.img)
    img_entry = next(i for i in ann["images"]
                     if os.path.basename(i["file_name"]) == base)
    cat_ids = sorted(c["id"] for c in ann["categories"])
    cat2label = {c: i for i, c in enumerate(cat_ids)}
    names = [c["name"] for c in sorted(ann["categories"],
                                       key=lambda c: c["id"])]
    gts = [a for a in ann["annotations"]
           if a["image_id"] == img_entry["id"]]
    gt_boxes = np.array([[a["bbox"][0], a["bbox"][1],
                          a["bbox"][0] + a["bbox"][2],
                          a["bbox"][1] + a["bbox"][3]] for a in gts]
                        ).reshape(-1, 4)
    gt_labels = np.array([cat2label[a["category_id"]] for a in gts],
                         np.int64)

    if args.results:
        with open(args.results) as f:
            results = json.load(f)
        per_class = [[] for _ in cat_ids]
        for r in results:
            if r["image_id"] != img_entry["id"]:
                continue
            x, y, w, h = r["bbox"]
            per_class[cat2label[r["category_id"]]].append(
                [x, y, x + w, y + h, r["score"]])
        det_result = [np.array(d, np.float32).reshape(-1, 5)
                      for d in per_class]
        imshow_gt_det_bboxes(arr, gt_boxes, gt_labels, det_result,
                             class_names=names, score_thr=args.score_thr,
                             out_file=args.out)
    else:
        imshow_det_bboxes(arr, gt_boxes, gt_labels, class_names=names,
                          out_file=args.out)
    print(f"wrote {args.out} ({len(gts)} GT boxes)")


if __name__ == "__main__":
    main()

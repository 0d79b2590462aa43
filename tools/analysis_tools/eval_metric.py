#!/usr/bin/env python
"""Re-evaluate a saved COCO results json without re-running inference.

Parity: tools/analysis_tools/eval_metric.py — score a pkl/json of saved
detections against the dataset annotations.

Usage:
  python tools/analysis_tools/eval_metric.py CONFIG RESULTS.json \
      [--task T] [--classwise]
"""
import argparse
import json
import logging
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("results", help="COCO results json (tools/test.py"
                                        " --out)")
    parser.add_argument("--task", type=int, default=None)
    parser.add_argument("--classwise", action="store_true")
    parser.add_argument("--set", nargs="*", default=[])
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                        format="%(message)s")
    log = logging.getLogger("dskd_tpu")

    import numpy as np

    from dskd_tpu.eval.coco_eval import CocoDetectionEval
    from dskd_tpu.train.incremental import make_datasets
    from dskd_tpu.utils.config import apply_overrides, load_config

    cfg = apply_overrides(load_config(args.config), args.set)
    task_nums = len(cfg.data.catsplit)
    tid = args.task or task_nums
    _, val_ds = make_datasets(cfg, tid, task_nums)

    pred_cat_ids = [val_ds.ALL_CLASSES_IDS[n] for n in val_ds.PRED_CLASSES]
    ev = CocoDetectionEval(cat_ids=pred_cat_ids)

    with open(args.results) as f:
        dets = json.load(f)
    by_img = {}
    for d in dets:
        by_img.setdefault(d["image_id"], []).append(d)
    for img_id, ds in by_img.items():
        boxes = np.array([[d["bbox"][0], d["bbox"][1],
                           d["bbox"][0] + d["bbox"][2],
                           d["bbox"][1] + d["bbox"][3]] for d in ds])
        ev.add_dt(img_id, boxes, np.array([d["score"] for d in ds]),
                  [d["category_id"] for d in ds])

    for img_id in by_img:
        anns = [a for a in val_ds.coco.annotations(img_id)
                if a["category_id"] in set(pred_cat_ids)]
        if not anns:
            continue
        gt = np.array([[a["bbox"][0], a["bbox"][1],
                        a["bbox"][0] + a["bbox"][2],
                        a["bbox"][1] + a["bbox"][3]] for a in anns])
        ev.add_gt(img_id, gt, [a["category_id"] for a in anns],
                  iscrowd=[a.get("iscrowd", 0) for a in anns],
                  areas=[a.get("area", None) or a["bbox"][2] * a["bbox"][3]
                         for a in anns])

    stats = ev.summarize()
    for k, v in stats.items():
        log.info("%s: %.4f", k, v)
    if args.classwise:
        for cid, ap in ev.per_class_ap().items():
            log.info("AP_%s: %.4f", val_ds.ALL_IDS_CLASSES[cid], ap)


if __name__ == "__main__":
    main()

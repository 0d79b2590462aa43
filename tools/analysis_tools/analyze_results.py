#!/usr/bin/env python
"""Rank evaluated images by per-image detection quality.

Parity: tools/analysis_tools/analyze_results.py — score every image by a
per-image mAP proxy over its saved detections, then render the top-k best
and worst images with GT (green) and detection (red) boxes.

Usage: python tools/analysis_tools/analyze_results.py CONFIG RESULTS.json \
    OUT_DIR [--topk 20] [--task T]
"""
import argparse
import json
import logging
import os
import sys

import numpy as np


def per_image_score(dets, gts, iou_thr=0.5):
    """Greedy matched-fraction score in [0, 1]: harmonic mean of det
    precision and GT recall (a light-weight stand-in for per-image mAP)."""
    from dskd_tpu.eval.mean_ap import _overlaps
    if len(dets) == 0:
        return 0.0 if len(gts) else 1.0
    if len(gts) == 0:
        return 0.0
    ious = _overlaps(dets[:, :4], gts)
    order = np.argsort(-dets[:, 4])
    covered = np.zeros(len(gts), bool)
    tp = 0
    for i in order:
        j = ious[i].argmax()
        if ious[i, j] >= iou_thr and not covered[j]:
            covered[j] = True
            tp += 1
    prec = tp / len(dets)
    rec = tp / len(gts)
    return 2 * prec * rec / max(prec + rec, 1e-9)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("results")
    parser.add_argument("out_dir")
    parser.add_argument("--topk", type=int, default=20)
    parser.add_argument("--task", type=int, default=None)
    parser.add_argument("--score-thr", type=float, default=0.3)
    parser.add_argument("--set", nargs="*", default=[])
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                        format="%(message)s")
    log = logging.getLogger("dskd_tpu")

    import cv2

    from dskd_tpu.train.incremental import make_datasets
    from dskd_tpu.utils.config import apply_overrides, load_config

    cfg = apply_overrides(load_config(args.config), args.set)
    task_nums = len(cfg.data.catsplit)
    tid = args.task or task_nums
    _, val_ds = make_datasets(cfg, tid, task_nums)

    with open(args.results) as f:
        all_dets = json.load(f)
    by_img = {}
    for d in all_dets:
        if d["score"] >= args.score_thr:
            by_img.setdefault(d["image_id"], []).append(d)

    scores = []
    per_img = {}
    for i in range(len(val_ds)):
        path, _, gts, _, img_id = val_ds.get_raw(i)
        ds = by_img.get(img_id, [])
        dets = np.array([[d["bbox"][0], d["bbox"][1],
                          d["bbox"][0] + d["bbox"][2],
                          d["bbox"][1] + d["bbox"][3], d["score"]]
                         for d in ds]).reshape(-1, 5)
        s = per_image_score(dets, gts)
        scores.append((s, img_id, path))
        per_img[img_id] = dets
    scores.sort()

    os.makedirs(args.out_dir, exist_ok=True)
    gt_by_id = {val_ds.get_raw(i)[4]: val_ds.get_raw(i)[2]
                for i in range(len(val_ds))}

    def render(rank, s, img_id, path, tag):
        img = cv2.imread(path)
        if img is None:
            return
        for b in gt_by_id.get(img_id, []):
            cv2.rectangle(img, (int(b[0]), int(b[1])),
                          (int(b[2]), int(b[3])), (0, 255, 0), 2)
        for b in per_img.get(img_id, []):
            cv2.rectangle(img, (int(b[0]), int(b[1])),
                          (int(b[2]), int(b[3])), (0, 0, 255), 2)
            cv2.putText(img, f"{b[4]:.2f}", (int(b[0]), int(b[1]) - 3),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.4, (0, 0, 255), 1)
        out = os.path.join(args.out_dir,
                           f"{tag}_{rank:03d}_score{s:.3f}_{img_id}.jpg")
        cv2.imwrite(out, img)

    for rank, (s, img_id, path) in enumerate(scores[:args.topk]):
        render(rank, s, img_id, path, "worst")
    for rank, (s, img_id, path) in enumerate(scores[::-1][:args.topk]):
        render(rank, s, img_id, path, "best")
    log.info("wrote %d best/worst renders to %s",
             2 * min(args.topk, len(scores)), args.out_dir)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""K-means anchor optimization over a dataset's GT box shapes.

Parity: tools/analysis_tools/optimize_anchors.py (k-means variant): cluster
GT (w, h) under the 1-IoU distance of zero-centered boxes and report anchor
scales/ratios for anchor-based heads (YOLOF/RetinaNet-style).

Usage: python tools/analysis_tools/optimize_anchors.py CONFIG \
    --num-anchors 5 [--task T] [--iters 100]
"""
import argparse
import logging
import sys

import numpy as np


def wh_iou(wh1: np.ndarray, wh2: np.ndarray) -> np.ndarray:
    """IoU of zero-centered (w, h) boxes: (N, 1, 2) x (1, K, 2) -> (N, K)."""
    inter = np.minimum(wh1[:, None, 0], wh2[None, :, 0]) * np.minimum(
        wh1[:, None, 1], wh2[None, :, 1])
    union = (wh1[:, 0] * wh1[:, 1])[:, None] + (
        wh2[:, 0] * wh2[:, 1])[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def kmeans_anchors(whs: np.ndarray, k: int, iters: int = 100, seed: int = 0):
    """K-means under 1-IoU distance; returns (k, 2) anchors sorted by area."""
    rng = np.random.RandomState(seed)
    centers = whs[rng.choice(len(whs), k, replace=False)].astype(np.float64)
    assign = None
    for _ in range(iters):
        d = 1.0 - wh_iou(whs, centers)
        new_assign = d.argmin(1)
        if assign is not None and (new_assign == assign).all():
            break
        assign = new_assign
        for j in range(k):
            sel = whs[assign == j]
            if len(sel):
                centers[j] = np.median(sel, axis=0)
    order = np.argsort(centers[:, 0] * centers[:, 1])
    return centers[order], float(wh_iou(whs, centers).max(1).mean())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--num-anchors", type=int, default=5)
    parser.add_argument("--task", type=int, default=None)
    parser.add_argument("--iters", type=int, default=100)
    parser.add_argument("--set", nargs="*", default=[])
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                        format="%(message)s")
    log = logging.getLogger("dskd_tpu")

    from dskd_tpu.data.pipeline import rescale_size
    from dskd_tpu.train.incremental import make_datasets
    from dskd_tpu.utils.config import apply_overrides, load_config

    cfg = apply_overrides(load_config(args.config), args.set)
    task_nums = len(cfg.data.catsplit)
    tid = args.task or task_nums
    train_ds, _ = make_datasets(cfg, tid, task_nums)

    whs = []
    for i in range(len(train_ds)):
        _, (h, w), boxes, _, _ = train_ds.get_raw(i)
        _, _, f = rescale_size(h, w, cfg.data.img_scale)
        for b in boxes:
            bw, bh = (b[2] - b[0]) * f, (b[3] - b[1]) * f
            if bw > 1 and bh > 1:
                whs.append((bw, bh))
    whs = np.array(whs)
    log.info("%d GT boxes (resized to %s)", len(whs), cfg.data.img_scale)

    anchors, mean_iou = kmeans_anchors(whs, args.num_anchors, args.iters)
    log.info("mean best-anchor IoU: %.4f", mean_iou)
    for w, h in anchors:
        log.info("anchor w=%.1f h=%.1f (scale=%.2f ratio=%.2f)",
                 w, h, np.sqrt(w * h), h / w)


if __name__ == "__main__":
    main()

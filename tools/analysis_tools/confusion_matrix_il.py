#!/usr/bin/env python
"""Confusion matrix over IL predictions (parity:
tools/analysis_tools/confusion_matrix_il.py: calculate_confusion_matrix at
:66, plot at :152). Computes a (num_classes+1, num_classes+1) matrix from
per-image detections vs GT at an IoU threshold; the extra row/col is
background (missed / false positive).
"""
import argparse

import numpy as np


def calculate_confusion_matrix(gts, dets, num_classes, score_thr=0.3,
                               iou_thr=0.5):
    """gts/dets: per-image lists. Each gt: (boxes (G,4), labels (G,)).
    Each det: per-class list of (n, 5) arrays (the bbox2result format)."""
    from dskd_tpu.eval.coco_eval import bbox_iou_xywh

    cm = np.zeros((num_classes + 1, num_classes + 1), np.float64)
    for (gt_boxes, gt_labels), det in zip(gts, dets):
        all_boxes, all_labels, all_scores = [], [], []
        for c, d in enumerate(det):
            if len(d):
                keep = d[:, 4] >= score_thr
                all_boxes.append(d[keep, :4])
                all_labels.extend([c] * int(keep.sum()))
                all_scores.extend(d[keep, 4].tolist())
        if all_boxes:
            det_boxes = np.concatenate(all_boxes)
            det_labels = np.array(all_labels)
        else:
            det_boxes = np.zeros((0, 4))
            det_labels = np.zeros((0,), int)

        def to_xywh(b):
            return np.stack([b[:, 0], b[:, 1], b[:, 2] - b[:, 0],
                             b[:, 3] - b[:, 1]], -1)

        ious = bbox_iou_xywh(to_xywh(det_boxes), to_xywh(gt_boxes),
                             np.zeros(len(gt_boxes)))
        gt_matched = np.zeros(len(gt_boxes), bool)
        order = np.argsort(-np.array(all_scores)) if all_scores else []
        for d in order:
            best = ious[d].argmax() if len(gt_boxes) else -1
            if best >= 0 and ious[d, best] >= iou_thr and not gt_matched[best]:
                gt_matched[best] = True
                cm[gt_labels[best], det_labels[d]] += 1
            else:
                cm[num_classes, det_labels[d]] += 1   # false positive
        for g in np.where(~gt_matched)[0]:
            cm[gt_labels[g], num_classes] += 1        # missed
    return cm


def plot_confusion_matrix(cm, class_names, out_file="confusion_matrix.png",
                          normalize=True):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if normalize:
        cm = cm / np.maximum(cm.sum(1, keepdims=True), 1)
    fig, ax = plt.subplots(figsize=(12, 12))
    ax.imshow(cm, cmap="Blues")
    names = list(class_names) + ["background"]
    ax.set_xticks(range(len(names)))
    ax.set_yticks(range(len(names)))
    ax.set_xticklabels(names, rotation=90, fontsize=6)
    ax.set_yticklabels(names, fontsize=6)
    ax.set_xlabel("prediction")
    ax.set_ylabel("ground truth")
    fig.tight_layout()
    fig.savefig(out_file, dpi=150)
    return out_file


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--task", type=int, default=None)
    parser.add_argument("--score-thr", type=float, default=0.3)
    parser.add_argument("--iou-thr", type=float, default=0.5)
    parser.add_argument("--out", default="confusion_matrix.png")
    args = parser.parse_args()

    import jax

    from dskd_tpu.apis.inference import inference_detector
    from dskd_tpu.train.checkpoint import (find_latest_checkpoint,
                                           restore_checkpoint)
    from dskd_tpu.train.incremental import (build_model, init_variables,
                                            make_datasets)
    from dskd_tpu.utils.config import load_config

    cfg = load_config(args.config)
    task_nums = len(cfg.data.catsplit)
    tid = args.task or task_nums
    model = build_model(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    ck = find_latest_checkpoint(cfg.train.work_dir, task=tid)
    assert ck, f"no checkpoint in {cfg.train.work_dir}"
    restored = restore_checkpoint(
        cfg.train.work_dir, ck[0], ck[1],
        template={"params": variables["params"],
                  "batch_stats": variables.get("batch_stats", {}),
                  "opt_state": None, "step": 0})
    variables = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}

    _, val_ds = make_datasets(cfg, tid, task_nums)
    gts, dets = [], []
    for i in range(len(val_ds)):
        path, _, boxes, labels, _ = val_ds.get_raw(i)
        gts.append((boxes, labels))
        dets.append(inference_detector(model, variables, cfg, path))
    cm = calculate_confusion_matrix(gts, dets, cfg.model.num_classes,
                                    args.score_thr, args.iou_thr)
    plot_confusion_matrix(cm, val_ds.CLASSES, args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()

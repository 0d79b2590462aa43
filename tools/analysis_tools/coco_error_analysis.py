#!/usr/bin/env python
"""COCO error analysis: per-class PR decomposition by error type.

Parity target: tools/analysis_tools/coco_error_analysis.py in the
reference (the pycocotools `analyze()` protocol): for every class, stack
PR curves at progressively forgiving settings —

  C75  precision at IoU .75
  C50  precision at IoU .5
  Loc  precision at IoU .1 (localization errors forgiven)
  Oth  IoU .1 CLASS-AGNOSTIC matching (any class confusion forgiven;
       without a supercategory map the reference's Sim bucket folds in
       here — documented divergence)
  BG   all remaining false positives removed (= 1 wherever Oth > 0)
  FN   all false negatives removed (= 1 everywhere valid)

The gap between successive curves is that error type's contribution.
Outputs a JSON of per-class and mean areas-under-curve per type, plus
optional per-class PR plots.

Usage:
  python tools/analysis_tools/coco_error_analysis.py RESULTS.json \
      --ann ANN.json [--out-dir DIR] [--plot]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from dskd_tpu.eval.coco_eval import REC_THRS, CocoDetectionEval  # noqa: E402


def _load_ann(path):
    with open(path) as f:
        ann = json.load(f)
    cats = sorted(c["id"] for c in ann["categories"])
    gt_by_img = {}
    for a in ann["annotations"]:
        gt_by_img.setdefault(a["image_id"], []).append(a)
    return ann, cats, gt_by_img


def _build_eval(ann, cats, gt_by_img, results, iou_thrs,
                class_agnostic=False):
    ev = CocoDetectionEval(cats if not class_agnostic else [0],
                           iou_thrs=iou_thrs)
    for img_id, anns in gt_by_img.items():
        boxes = np.array([[a["bbox"][0], a["bbox"][1],
                           a["bbox"][0] + a["bbox"][2],
                           a["bbox"][1] + a["bbox"][3]] for a in anns])
        cat = np.array([0 if class_agnostic else a["category_id"]
                        for a in anns])
        crowd = np.array([a.get("iscrowd", 0) for a in anns])
        areas = np.array([a.get("area", a["bbox"][2] * a["bbox"][3])
                          for a in anns])
        ev.add_gt(img_id, boxes, cat, iscrowd=crowd, areas=areas)
    for r in results:
        x, y, w, h = r["bbox"]
        ev.add_dt(r["image_id"], np.array([[x, y, x + w, y + h]]),
                  np.array([r["score"]]),
                  np.array([0 if class_agnostic else r["category_id"]]))
    return ev


def analyze(ann_file, result_file, out_dir=None, plot=False):
    ann, cats, gt_by_img = _load_ann(ann_file)
    with open(result_file) as f:
        results = json.load(f)

    # one eval at [.75, .5, .1] per-class; one class-agnostic at [.1]
    ev = _build_eval(ann, cats, gt_by_img, results, [0.75, 0.5, 0.1])
    prec, _ = ev.accumulate()                 # (3, R, K, A, M)
    ev_ag = _build_eval(ann, cats, gt_by_img, results, [0.1],
                        class_agnostic=True)
    prec_ag, _ = ev_ag.accumulate()           # (1, R, 1, A, M)

    ai, mi = 0, len(ev.max_dets) - 1          # area 'all', maxDets 100
    report = {"classes": {}, "mean": {}}
    curves_per_class = {}
    for k, cat in enumerate(cats):
        c75 = prec[0, :, k, ai, mi]
        c50 = prec[1, :, k, ai, mi]
        loc = prec[2, :, k, ai, mi]
        oth = np.maximum(loc, prec_ag[0, :, 0, ai, mi])
        valid = c75 > -1
        bg = np.where(oth > 0, 1.0, oth)
        fn = np.where(valid, 1.0, -1.0)
        curves = {"C75": c75, "C50": c50, "Loc": loc, "Oth": oth,
                  "BG": bg, "FN": fn}
        curves_per_class[cat] = curves
        report["classes"][str(cat)] = {
            name: (float(c[valid].mean()) if valid.any() else -1.0)
            for name, c in curves.items()}

    names = ["C75", "C50", "Loc", "Oth", "BG", "FN"]
    for n in names:
        vals = [v[n] for v in report["classes"].values() if v[n] > -1]
        report["mean"][n] = float(np.mean(vals)) if vals else -1.0

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "error_analysis.json"), "w") as f:
            json.dump(report, f, indent=2)
        if plot:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            for cat, curves in curves_per_class.items():
                fig, ax = plt.subplots(figsize=(5, 5))
                prev = np.zeros_like(REC_THRS)
                for n in names:
                    c = np.clip(curves[n], 0, 1)
                    ax.fill_between(REC_THRS, prev, c, alpha=0.6,
                                    label=f"{n}: "
                                          f"{report['classes'][str(cat)][n]:.3f}")
                    prev = np.maximum(prev, c)
                ax.set_xlabel("recall")
                ax.set_ylabel("precision")
                ax.set_title(f"category {cat}")
                ax.legend(loc="lower left", fontsize=7)
                fig.savefig(os.path.join(out_dir, f"cat_{cat}.png"),
                            dpi=100)
                plt.close(fig)
    return report


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("result", help="results json (coco bbox format)")
    p.add_argument("--ann", required=True, help="annotation json")
    p.add_argument("--out-dir", default=None)
    p.add_argument("--plot", action="store_true")
    args = p.parse_args()
    report = analyze(args.ann, args.result, args.out_dir, args.plot)
    print(json.dumps(report["mean"], indent=2))


if __name__ == "__main__":
    main()

"""VOC / non-VOC cross-category COCO split (parity:
mmdet/datasets/coco_split.py CocoSplitDataset + cocoeval_wrappers).

The open-set (OLN-style) protocol: train on one class group (e.g. the 20
VOC classes), evaluate class-agnostic recall on another (e.g. the 60
non-VOC classes); GT outside the eval split is flagged so matched
detections are neither TP nor FP (COCOEvalXclassWrapper's ignored_split).
Evaluation runs class-agnostic (useCats=0) with AR@{10..1500} stats.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .coco import COCO_CLASSES_MMDET_ORDER, CocoAnnotations

# the 20 PASCAL-VOC categories present in COCO (public metadata)
VOC_CLASS_NAMES = (
    "airplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "dining table", "dog", "horse", "motorcycle", "person",
    "potted plant", "sheep", "couch", "train", "tv")


class CocoSplitDataset:
    """COCO with train/eval category splits and class-agnostic labels."""

    def __init__(self, ann_file: str, img_prefix: str = "",
                 is_class_agnostic: bool = True,
                 train_class: str = "voc", eval_class: str = "nonvoc",
                 test_mode: bool = False, filter_empty: bool = True):
        assert train_class in ("voc", "nonvoc", "all")
        assert eval_class in ("voc", "nonvoc", "all")
        self.coco = CocoAnnotations(ann_file)
        self.img_prefix = img_prefix
        self.is_class_agnostic = is_class_agnostic
        self.test_mode = test_mode

        name2id = dict(COCO_CLASSES_MMDET_ORDER)
        voc_ids = {name2id[n] for n in VOC_CLASS_NAMES}
        all_ids = set(name2id.values())

        def group(which):
            return {"voc": voc_ids, "nonvoc": all_ids - voc_ids,
                    "all": all_ids}[which]

        self.train_cat_ids = sorted(group(train_class))
        self.eval_cat_ids = sorted(group(eval_class))
        self.CLASSES = ("object",) if is_class_agnostic else tuple(
            n for n, i in COCO_CLASSES_MMDET_ORDER)
        self.cat2label = ({c: 0 for c in all_ids} if is_class_agnostic
                          else {c: i for i, (_, c) in
                                enumerate(COCO_CLASSES_MMDET_ORDER)})

        keep_ids = set(self.train_cat_ids if not test_mode
                       else self.eval_cat_ids)
        self.samples = []
        for img_id in self.coco.img_ids:
            anns = [a for a in self.coco.annotations(img_id)
                    if not a.get("iscrowd", 0)
                    and a["category_id"] in keep_ids
                    and a["bbox"][2] > 1 and a["bbox"][3] > 1]
            if filter_empty and not anns:
                continue
            self.samples.append((img_id, anns))

    def __len__(self):
        return len(self.samples)

    def get_raw(self, idx: int):
        import os
        img_id, anns = self.samples[idx]
        info = self.coco.images[img_id]
        path = os.path.join(self.img_prefix, info["file_name"])
        boxes = np.array(
            [[a["bbox"][0], a["bbox"][1],
              a["bbox"][0] + a["bbox"][2], a["bbox"][1] + a["bbox"][3]]
             for a in anns], np.float32).reshape(-1, 4)
        labels = np.array([self.cat2label[a["category_id"]] for a in anns],
                          np.int32)
        return path, (info["height"], info["width"]), boxes, labels, img_id

    def make_evaluator(self, max_dets=(10, 20, 50, 100, 300, 500, 1000,
                                       1500)):
        """Class-agnostic x-class evaluator: GT outside the eval split is
        ignore-flagged (COCOEvalXclassWrapper semantics, useCats=0)."""
        from ..eval.coco_eval import CocoDetectionEval
        ev = CocoDetectionEval(cat_ids=[0], max_dets=max_dets)
        eval_set = set(self.eval_cat_ids)
        for img_id, _ in self.samples:
            anns = self.coco.annotations(img_id)
            if not anns:
                continue
            boxes = np.array(
                [[a["bbox"][0], a["bbox"][1],
                  a["bbox"][0] + a["bbox"][2],
                  a["bbox"][1] + a["bbox"][3]] for a in anns])
            ignore = np.array(
                [a["category_id"] not in eval_set
                 or a.get("iscrowd", 0) for a in anns], np.float64)
            ev.add_gt(img_id, boxes, np.zeros(len(anns), np.int32),
                      ignore_flags=ignore,
                      areas=[a.get("area") or a["bbox"][2] * a["bbox"][3]
                             for a in anns])
        return ev

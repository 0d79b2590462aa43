"""Native LVIS v1 dataset + evaluation protocol
(parity: mmdet/datasets/lvis.py:742).

LVIS differs from COCO in three evaluation-relevant ways, all implemented
here from the protocol description:
  * federated annotation: category c is only evaluated on images where it
    is exhaustively annotated (c has GT) or explicitly negative
    (``neg_category_ids``); detections of c elsewhere are DROPPED, not
    counted as false positives;
  * per-image detection cap 300 (vs COCO's 100), no per-category cap;
  * AP is additionally reported over frequency bins: APr (rare, <=10
    training images), APc (common), APf (frequent) from each category's
    ``frequency`` field.
File names derive from ``coco_url`` when ``file_name`` is absent
(LVIS images are COCO images).

Duck-type contract shared with TaskCocoDataset: __len__, get_raw ->
(path, (h, w), boxes, labels, img_id).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence

import numpy as np

from ..eval.coco_eval import CocoDetectionEval


class LvisDataset:
    def __init__(self, ann_file: str, img_prefix: str = "",
                 test_mode: bool = False, filter_empty: bool = True):
        with open(ann_file) as f:
            data = json.load(f)
        self.img_prefix = img_prefix
        self.test_mode = test_mode
        self.categories = {c["id"]: c for c in data["categories"]}
        self.cat_ids = sorted(self.categories)
        self.cat2label = {c: i for i, c in enumerate(self.cat_ids)}
        self.label2cat = {i: c for c, i in self.cat2label.items()}
        self.CLASSES = tuple(self.categories[c]["name"]
                             for c in self.cat_ids)
        self.images = {im["id"]: im for im in data["images"]}
        anns: Dict[int, list] = {i: [] for i in self.images}
        for a in data["annotations"]:
            if a["image_id"] in anns:
                anns[a["image_id"]].append(a)
        self.img_anns = anns
        self.img_ids = sorted(self.images)
        if filter_empty and not test_mode:
            self.img_ids = [i for i in self.img_ids if anns[i]]

    @staticmethod
    def _file_name(info) -> str:
        if "file_name" in info:
            return info["file_name"]
        # http://images.cocodataset.org/train2017/000000391895.jpg
        parts = info["coco_url"].rstrip("/").split("/")
        return os.path.join(parts[-2], parts[-1])

    def __len__(self):
        return len(self.img_ids)

    def get_raw(self, idx: int):
        img_id = self.img_ids[idx]
        info = self.images[img_id]
        anns = self.img_anns[img_id]
        boxes = np.array(
            [[a["bbox"][0], a["bbox"][1],
              a["bbox"][0] + a["bbox"][2], a["bbox"][1] + a["bbox"][3]]
             for a in anns], np.float32).reshape(-1, 4)
        labels = np.array([self.cat2label[a["category_id"]] for a in anns],
                          np.int32)
        path = os.path.join(self.img_prefix, self._file_name(info))
        return path, (info["height"], info["width"]), boxes, labels, img_id

    def get_segmentations(self, idx: int):
        """Raw 'segmentation' payloads aligned with get_raw's box order
        (LVIS anns are COCO-format polygons) — lets Mask R-CNN train on
        the lvis binding (configs/lvis mask_rcnn recipes)."""
        return [a.get("segmentation")
                for a in self.img_anns[self.img_ids[idx]]]

    def _allowed_cats(self, img_id: int) -> set:
        """Categories evaluated on this image: positives + declared
        negatives (the federated-annotation rule)."""
        pos = {a["category_id"] for a in self.img_anns[img_id]}
        neg = set(self.images[img_id].get("neg_category_ids", []))
        return pos | neg

    def evaluate(self, results: Dict[int, dict],
                 max_dets: int = 300) -> Dict[str, float]:
        """results[img_id] = dict(bboxes (N, 4) xyxy, scores (N,),
        labels (N,)). Returns AP/AP50/AP75/APs/APm/APl + APr/APc/APf."""
        def run(cat_subset: Sequence[int]) -> Dict[str, float]:
            ev = CocoDetectionEval(cat_ids=list(cat_subset),
                                   max_dets=(max_dets,))
            cat_set = set(cat_subset)
            for img_id in self.img_ids:
                allowed = self._allowed_cats(img_id) & cat_set
                anns = self.img_anns[img_id]
                g = np.array(
                    [[a["bbox"][0], a["bbox"][1],
                      a["bbox"][0] + a["bbox"][2],
                      a["bbox"][1] + a["bbox"][3]]
                     for a in anns if a["category_id"] in cat_set],
                    np.float32).reshape(-1, 4)
                gc = [a["category_id"] for a in anns
                      if a["category_id"] in cat_set]
                ev.add_gt(img_id, g, gc)
                r = results.get(img_id)
                if r is None:
                    continue
                keep = np.array(
                    [self.label2cat[int(l)] in allowed
                     for l in r["labels"]], bool)
                ev.add_dt(img_id, np.asarray(r["bboxes"])[keep],
                          np.asarray(r["scores"])[keep],
                          [self.label2cat[int(l)]
                           for l, k in zip(r["labels"], keep) if k])
            ev.accumulate()
            s = ev.summarize()
            # normalize key names to the LVIS report convention
            return {"AP": s["bbox_mAP"], "AP50": s["bbox_mAP_50"],
                    "AP75": s["bbox_mAP_75"], "APs": s["bbox_mAP_s"],
                    "APm": s["bbox_mAP_m"], "APl": s["bbox_mAP_l"],
                    f"AR@{max_dets}": s[f"AR@{max_dets}"]}

        out = dict(run(self.cat_ids))
        for freq, key in (("r", "APr"), ("c", "APc"), ("f", "APf")):
            subset = [c for c in self.cat_ids
                      if self.categories[c].get("frequency") == freq]
            ap = run(subset)["AP"] if subset else float("nan")
            # -1 = no GT for the whole bin (e.g. a negative-only category)
            out[key] = float("nan") if ap == -1.0 else ap
        return out

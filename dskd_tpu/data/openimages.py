"""OpenImages detection dataset (parity: mmdet/datasets/openimages.py:841,
the CSV-based OpenImagesDataset).

Implements the format and the two evaluation-relevant protocol pieces:
  * CSV annotations (ImageID, LabelName, XMin/XMax/YMin/YMax normalized,
    IsGroupOf) + class-descriptions CSV mapping MID label names to
    human-readable class names, ordered as given in the description file;
  * the class hierarchy (JSON): ground truth AND detections are expanded
    to all ancestor classes before evaluation (`expand_labels`), the
    OpenImages rule that a 'Jaguar' also counts as 'Carnivore'/'Animal';
  * IsGroupOf boxes become ignore regions (the reference evaluates them
    with IoA semantics; routed to eval_map's bboxes_ignore here —
    documented simplification).

Image sizes: OpenImages CSVs carry normalized coordinates and no pixel
dims; pass ``image_dims`` ({ImageID: (h, w)}) or sizes resolve lazily
from the image file on first access.
"""
from __future__ import annotations

import csv
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def load_class_descriptions(path: str):
    """CSV of (MID, display name) -> (ordered names, mid->label index)."""
    names, mid2label = [], {}
    with open(path) as f:
        for row in csv.reader(f):
            if not row:
                continue
            mid2label[row[0]] = len(names)
            names.append(row[1])
    return tuple(names), mid2label


def load_hierarchy(path: str, mid2label) -> Dict[int, List[int]]:
    """OpenImages hierarchy JSON -> {label: [ancestor labels]} (excluding
    the root 'Entity' node, matching the reference's get_ancestors)."""
    with open(path) as f:
        tree = json.load(f)
    ancestors: Dict[int, List[int]] = {}

    def walk(node, chain):
        mid = node.get("LabelName")
        lbl = mid2label.get(mid)
        nxt = chain
        if lbl is not None:
            ancestors.setdefault(lbl, [])
            for a in chain:
                if a not in ancestors[lbl]:
                    ancestors[lbl].append(a)
            nxt = chain + [lbl]
        for sub in node.get("Subcategory", []):
            walk(sub, nxt)

    walk(tree, [])
    return ancestors


def expand_labels(boxes: np.ndarray, labels: np.ndarray,
                  ancestors: Dict[int, List[int]],
                  scores: Optional[np.ndarray] = None):
    """Duplicate each (box, label) for every ancestor class."""
    out_b, out_l, out_s = [boxes], [labels], [scores]
    for i, l in enumerate(labels):
        for a in ancestors.get(int(l), []):
            out_b.append(boxes[i:i + 1])
            out_l.append(np.array([a], labels.dtype))
            if scores is not None:
                out_s.append(scores[i:i + 1])
    b = np.concatenate(out_b) if len(out_b) > 1 else boxes
    l = np.concatenate(out_l) if len(out_l) > 1 else labels
    if scores is None:
        return b, l
    s = np.concatenate([x for x in out_s if x is not None])
    return b, l, s


class OpenImagesDataset:
    def __init__(self, ann_file: str, cls_desc_file: str,
                 img_prefix: str = "", hierarchy_file: str = None,
                 image_dims: Optional[Dict[str, tuple]] = None,
                 test_mode: bool = False):
        self.CLASSES, self.mid2label = load_class_descriptions(
            cls_desc_file)
        self.ancestors = (load_hierarchy(hierarchy_file, self.mid2label)
                          if hierarchy_file else {})
        self.img_prefix = img_prefix
        self.image_dims = dict(image_dims or {})
        per_img: Dict[str, list] = {}
        with open(ann_file) as f:
            reader = csv.DictReader(f)
            for row in reader:
                lbl = self.mid2label.get(row["LabelName"])
                if lbl is None:
                    continue
                per_img.setdefault(row["ImageID"], []).append(
                    (float(row["XMin"]), float(row["YMin"]),
                     float(row["XMax"]), float(row["YMax"]), lbl,
                     int(row.get("IsGroupOf", 0) or 0)))
        self.img_ids = sorted(per_img)
        self.anns = per_img

    def __len__(self):
        return len(self.img_ids)

    def _dims(self, img_id: str):
        if img_id not in self.image_dims:
            import cv2
            im = cv2.imread(os.path.join(self.img_prefix,
                                         f"{img_id}.jpg"))
            self.image_dims[img_id] = im.shape[:2]
        return self.image_dims[img_id]

    def get_raw(self, idx: int):
        img_id = self.img_ids[idx]
        h, w = self._dims(img_id)
        rows = self.anns[img_id]
        scale = np.array([w, h, w, h], np.float32)
        plain = [r for r in rows if not r[5]]
        boxes = np.array([r[:4] for r in plain],
                         np.float32).reshape(-1, 4) * scale
        labels = np.array([r[4] for r in plain], np.int32)
        return (os.path.join(self.img_prefix, f"{img_id}.jpg"), (h, w),
                boxes, labels, idx)

    def get_ann(self, idx: int):
        img_id = self.img_ids[idx]
        h, w = self._dims(img_id)
        rows = self.anns[img_id]
        scale = np.array([w, h, w, h], np.float32)
        group = [r for r in rows if r[5]]
        _, _, boxes, labels, _ = self.get_raw(idx)
        boxes, labels = expand_labels(boxes, labels, self.ancestors)
        return dict(
            bboxes=boxes, labels=labels,
            bboxes_ignore=np.array([r[:4] for r in group],
                                   np.float32).reshape(-1, 4) * scale,
            labels_ignore=np.array([r[4] for r in group], np.int32))

    def evaluate(self, results: List[List[np.ndarray]],
                 iou_thr: float = 0.5):
        """results[i][c]: (m, 5) dets of class c in image i. Detections
        are hierarchy-expanded before the OpenImages-style mAP@0.5."""
        from ..eval.mean_ap import eval_map
        C = len(self.CLASSES)
        expanded = []
        for dets in results:
            per_cls = [d.reshape(-1, 5).copy() for d in dets]
            for c in range(C):
                for a in self.ancestors.get(c, []):
                    per_cls[a] = np.concatenate([per_cls[a], dets[c]
                                                 .reshape(-1, 5)])
            expanded.append(per_cls)
        anns = [self.get_ann(i) for i in range(len(self))]
        mean_ap, per_class = eval_map(expanded, anns, iou_thr=iou_thr)
        return dict(mAP=float(mean_ap), per_class=per_class)

"""Native Pascal-VOC XML dataset (parity: mmdet/datasets/xml_style.py:178 +
voc.py:112).

Reads the standard VOCdevkit layout without an offline COCO-format
conversion: ``{root}/ImageSets/Main/{split}.txt`` lists image ids,
``Annotations/{id}.xml`` carries per-object (name, bndbox, difficult),
``JPEGImages/{id}.jpg`` the pixels. Difficult objects are loaded as ignore
boxes (never counted, may match), exactly the reference's
bboxes_ignore routing. ``evaluate`` runs the dependency-free VOC mAP
(eval/mean_ap.py): iou 0.5, 11-point protocol for year 2007.

Duck-type contract shared with TaskCocoDataset: __len__, get_raw ->
(path, (h, w), boxes, labels, img_id) — plugs into data.loader.DataLoader.
"""
from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import List, Sequence

import numpy as np

VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor")


class VOCDataset:
    CLASSES = VOC_CLASSES

    def __init__(self, data_root: str, split: str = "trainval",
                 year: str = "2007", test_mode: bool = False,
                 filter_empty: bool = True,
                 classes: Sequence[str] = VOC_CLASSES):
        self.data_root = data_root
        self.year = year
        self.test_mode = test_mode
        self.CLASSES = tuple(classes)
        self.name2label = {n: i for i, n in enumerate(self.CLASSES)}
        list_file = os.path.join(data_root, "ImageSets", "Main",
                                 f"{split}.txt")
        with open(list_file) as f:
            ids = [ln.strip() for ln in f if ln.strip()]
        self.items = []
        for i, img_id in enumerate(ids):
            ann = self._parse_xml(img_id)
            if filter_empty and not test_mode and not len(ann["bboxes"]):
                continue
            self.items.append((i, img_id, ann))

    def _parse_xml(self, img_id: str):
        path = os.path.join(self.data_root, "Annotations",
                            f"{img_id}.xml")
        root = ET.parse(path).getroot()
        size = root.find("size")
        h = int(size.find("height").text)
        w = int(size.find("width").text)
        boxes, labels, ign_boxes, ign_labels = [], [], [], []
        for obj in root.findall("object"):
            name = obj.find("name").text
            if name not in self.name2label:
                continue
            bb = obj.find("bndbox")
            # VOC pixel indices are 1-based inclusive
            box = [float(bb.find("xmin").text) - 1,
                   float(bb.find("ymin").text) - 1,
                   float(bb.find("xmax").text),
                   float(bb.find("ymax").text)]
            difficult = obj.find("difficult")
            if difficult is not None and int(difficult.text):
                ign_boxes.append(box)
                ign_labels.append(self.name2label[name])
            else:
                boxes.append(box)
                labels.append(self.name2label[name])
        return dict(
            hw=(h, w),
            bboxes=np.asarray(boxes, np.float32).reshape(-1, 4),
            labels=np.asarray(labels, np.int32),
            bboxes_ignore=np.asarray(ign_boxes, np.float32).reshape(-1, 4),
            labels_ignore=np.asarray(ign_labels, np.int32))

    def __len__(self):
        return len(self.items)

    def get_raw(self, idx: int):
        _, img_id, ann = self.items[idx]
        path = os.path.join(self.data_root, "JPEGImages", f"{img_id}.jpg")
        return (path, ann["hw"], ann["bboxes"], ann["labels"],
                self.items[idx][0])

    def get_ann(self, idx: int):
        return self.items[idx][2]

    def evaluate(self, results: List[List[np.ndarray]],
                 iou_thr: float = 0.5):
        """results[i][c]: (m, 5) xyxy+score dets of class c in image i.
        Returns dict(mAP=..., per_class=[...]); 11-point protocol for the
        2007 devkit (reference voc.py dataset-year switch)."""
        from ..eval.mean_ap import eval_map
        anns = [dict(bboxes=it[2]["bboxes"], labels=it[2]["labels"],
                     bboxes_ignore=it[2]["bboxes_ignore"],
                     labels_ignore=it[2]["labels_ignore"])
                for it in self.items]
        mode = "11points" if self.year == "2007" else "area"
        mean_ap, per_class = eval_map(results, anns, iou_thr=iou_thr,
                                      mode=mode)
        return dict(mAP=float(mean_ap), per_class=per_class)


class WIDERFaceDataset(VOCDataset):
    """WIDER Face in PASCAL-VOC XML layout (parity:
    mmdet/datasets/wider_face.py — the sovrasov VOC-annotation
    conversion): single 'face' class; images live under
    ``WIDER_{split}/<folder>/<id>.jpg`` with the folder read from each
    XML's <folder> tag, annotation lists are flat id files."""
    CLASSES = ("face",)

    def __init__(self, data_root: str, split: str = "train",
                 test_mode: bool = False, filter_empty: bool = True):
        self.data_root = data_root
        self.test_mode = test_mode
        self.CLASSES = ("face",)
        self.name2label = {"face": 0}
        list_file = os.path.join(data_root, f"{split}.txt")
        with open(list_file) as f:
            ids = [ln.strip() for ln in f if ln.strip()]
        self.items = []
        self._folders = {}
        for i, img_id in enumerate(ids):
            ann = self._parse_xml(img_id)
            if filter_empty and not test_mode and not len(ann["bboxes"]):
                continue
            self.items.append((i, img_id, ann))

    def _parse_xml(self, img_id: str):
        path = os.path.join(self.data_root, "Annotations",
                            f"{img_id}.xml")
        root = ET.parse(path).getroot()
        folder = root.find("folder")
        self._folders[img_id] = folder.text if folder is not None else ""
        return VOCDataset._parse_xml(self, img_id)

    def get_raw(self, idx: int):
        _, img_id, ann = self.items[idx]
        path = os.path.join(self.data_root, self._folders.get(img_id, ""),
                            f"{img_id}.jpg")
        return (path, ann["hw"], ann["bboxes"], ann["labels"],
                self.items[idx][0])

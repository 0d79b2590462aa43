"""COCO panoptic dataset binding (parity: mmdet/datasets/coco_panoptic.py
692 + the panopticapi rgb2id/id2rgb codec).

Panoptic COCO format: each annotation entry carries ``segments_info``
(per-segment id / category_id / iscrowd / bbox / area) plus a color PNG
whose pixels encode the segment id as R + 256*G + 65536*B (rgb2id).
Categories carry an ``isthing`` flag; contiguous labels order things
first (0..T-1) then stuff (T..T+S-1), void = T+S — the convention
models/panoptic_fpn.py and eval/panoptic_eval.py consume.

The box/mask detection path reuses the standard loader: thing segments
convert to xyxy boxes + labels, so a CocoPanopticDataset can drive the
same train pipeline as TaskCocoDataset. The semantic map (per-pixel
contiguous category, 255 = void) feeds the semantic head target.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np


def rgb2id(color: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 RGB -> (H, W) int64 segment ids (panopticapi)."""
    c = color.astype(np.int64)
    return c[..., 0] + 256 * c[..., 1] + 256 * 256 * c[..., 2]


def id2rgb(ids: np.ndarray) -> np.ndarray:
    """(H, W) segment ids -> (H, W, 3) uint8 RGB (panopticapi)."""
    ids = ids.astype(np.int64)
    return np.stack([ids % 256, (ids // 256) % 256,
                     (ids // (256 * 256)) % 256], -1).astype(np.uint8)


class CocoPanopticDataset:
    """Minimal panoptic json + PNG reader.

    ann_file: panoptic json ({images, annotations, categories});
    seg_prefix: directory holding the per-image segment PNGs.
    """

    def __init__(self, ann_file: str, img_prefix: str = "",
                 seg_prefix: str = "", filter_empty: bool = True,
                 test_mode: bool = False):
        with open(ann_file) as f:
            data = json.load(f)
        self.img_prefix = img_prefix
        self.seg_prefix = seg_prefix
        self.images = {im["id"]: im for im in data["images"]}
        self.anns = {a["image_id"]: a for a in data["annotations"]}
        self.categories = {c["id"]: c for c in data["categories"]}

        # contiguous labels: things first, then stuff (coco_panoptic.py
        # CLASSES = THING_CLASSES + STUFF_CLASSES)
        thing_ids = [c["id"] for c in data["categories"] if c["isthing"]]
        stuff_ids = [c["id"] for c in data["categories"]
                     if not c["isthing"]]
        self.thing_cat_ids = thing_ids
        self.stuff_cat_ids = stuff_ids
        self.cat2label = {c: i for i, c in enumerate(thing_ids + stuff_ids)}
        self.label2cat = {i: c for c, i in self.cat2label.items()}
        self.num_things = len(thing_ids)
        self.num_stuff = len(stuff_ids)
        self.CLASSES = tuple(self.categories[c]["name"]
                             for c in thing_ids + stuff_ids)

        self.img_ids: List[int] = []
        for img_id in sorted(self.images):
            ann = self.anns.get(img_id)
            if ann is None:
                continue
            has_thing = any(
                self.categories[s["category_id"]]["isthing"]
                for s in ann["segments_info"])
            if filter_empty and not test_mode and not has_thing:
                continue
            self.img_ids.append(img_id)

    def __len__(self):
        return len(self.img_ids)

    def get_raw(self, idx: int):
        """Thing segments as detection GT: (img_path, (h, w), boxes xyxy,
        labels, img_id) — the TaskCocoDataset.get_raw contract so the
        standard DataLoader drives the box/mask branches."""
        img_id = self.img_ids[idx]
        info = self.images[img_id]
        path = os.path.join(self.img_prefix, info["file_name"])
        boxes, labels = [], []
        for s in self.anns[img_id]["segments_info"]:
            if not self.categories[s["category_id"]]["isthing"]:
                continue
            if s.get("iscrowd", 0):
                continue
            x, y, w, h = s["bbox"]
            boxes.append([x, y, x + w, y + h])
            labels.append(self.cat2label[s["category_id"]])
        return (path, (info["height"], info["width"]),
                np.asarray(boxes, np.float32).reshape(-1, 4),
                np.asarray(labels, np.int32), img_id)

    def get_segmentations(self, idx: int):
        """Thing-instance masks as uncompressed RLE payloads, aligned
        with get_raw's box order (the mask-branch training input)."""
        from .masks import rle_encode_uncompressed
        img_id = self.img_ids[idx]
        seg_ids = self._pan_map(img_id)
        out = []
        for s in self.anns[img_id]["segments_info"]:
            if not self.categories[s["category_id"]]["isthing"]:
                continue
            if s.get("iscrowd", 0):
                continue
            out.append(rle_encode_uncompressed(seg_ids == s["id"]))
        return out

    def _pan_map(self, img_id: int) -> np.ndarray:
        ann = self.anns[img_id]
        png = os.path.join(self.seg_prefix, ann["file_name"])
        try:
            import cv2
            bgr = cv2.imread(png, cv2.IMREAD_COLOR)
            rgb = bgr[:, :, ::-1]
        except Exception:
            from PIL import Image           # pragma: no cover
            rgb = np.asarray(Image.open(png).convert("RGB"))
        return rgb2id(rgb)

    def get_semantic(self, idx: int) -> np.ndarray:
        """(H, W) int32 per-pixel contiguous category (things 0..T-1,
        stuff T.., 255 = void) from the segment PNG + segments_info."""
        img_id = self.img_ids[idx]
        seg_ids = self._pan_map(img_id)
        out = np.full(seg_ids.shape, 255, np.int32)
        for s in self.anns[img_id]["segments_info"]:
            out[seg_ids == s["id"]] = self.cat2label[s["category_id"]]
        return out

    def get_pan_gt(self, img_id: int):
        """GT panoptic map in the repo pan-id convention
        (ins * INSTANCE_OFFSET + contiguous cat; void = T+S) plus the
        per-segment crowd dict — eval/panoptic_eval.py inputs."""
        from ..models.panoptic_fpn import INSTANCE_OFFSET
        seg_ids = self._pan_map(img_id)
        void = self.num_things + self.num_stuff
        pan = np.full(seg_ids.shape, void, np.int64)
        crowd: Dict[int, int] = {}
        inst = 1
        for s in self.anns[img_id]["segments_info"]:
            lbl = self.cat2label[s["category_id"]]
            if self.categories[s["category_id"]]["isthing"]:
                pid = lbl + inst * INSTANCE_OFFSET
                inst += 1
            else:
                pid = lbl
            pan[seg_ids == s["id"]] = pid
            if s.get("iscrowd", 0):
                crowd[pid] = 1
        return pan, crowd

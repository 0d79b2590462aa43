"""Cityscapes gtFine -> COCO-format instance annotations.

Parity target: tools/dataset_converters/cityscapes.py (reference): walk
``leftImg8bit/<split>`` images, read the paired
``gtFine_instanceIds.png`` maps, and emit one COCO json per split with
the 8 traffic-participant classes. Same id semantics as cityscapesscripts
(vendored as a table instead of the dependency): pixel value >= 1000 is
``label_id * 1000 + instance``, < 1000 is a crowd region of that label;
ids 29 (caravan) and 30 (trailer) are ignoreInEval and dropped.

Output feeds data/cityscapes.py CityscapesDataset (COCO-format loader).
Segmentations are polygon contours (cv2.findContours) so the mask
families can train from the converted json too.

Usage: python tools/dataset_converters/cityscapes.py CITYSCAPES_ROOT \
           -o OUT_DIR [--splits train val]
"""
from __future__ import annotations

import argparse
import glob
import json
import os

import cv2
import numpy as np

# cityscapesscripts labels.py: the hasInstances & !ignoreInEval subset
INSTANCE_LABELS = {
    24: "person", 25: "rider", 26: "car", 27: "truck", 28: "bus",
    31: "train", 32: "motorcycle", 33: "bicycle",
}


def mask_to_polygons(mask: np.ndarray):
    contours, _ = cv2.findContours(mask.astype(np.uint8),
                                   cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    polys = []
    for c in contours:
        c = c.reshape(-1, 2)
        if len(c) >= 3:
            polys.append(c.reshape(-1).astype(float).tolist())
    return polys


def convert_split(root: str, split: str) -> dict:
    img_dir = os.path.join(root, "leftImg8bit", split)
    gt_dir = os.path.join(root, "gtFine", split)
    suffix = "leftImg8bit.png"
    img_files = sorted(glob.glob(os.path.join(img_dir, "**", "*.png"),
                                 recursive=True))
    images, annotations = [], []
    ann_id = 1
    for img_id, img_file in enumerate(img_files, start=1):
        assert img_file.endswith(suffix), img_file
        rel = os.path.relpath(img_file, img_dir)
        inst_file = os.path.join(
            gt_dir, rel[:-len(suffix)] + "gtFine_instanceIds.png")
        inst = cv2.imread(inst_file, cv2.IMREAD_UNCHANGED)
        if inst is None:
            raise FileNotFoundError(inst_file)
        h, w = inst.shape[:2]
        images.append(dict(id=img_id, file_name=rel, height=int(h),
                           width=int(w)))
        for inst_id in np.unique(inst[inst >= 24]):
            label_id = int(inst_id // 1000 if inst_id >= 1000 else inst_id)
            if label_id not in INSTANCE_LABELS:
                continue
            iscrowd = int(inst_id < 1000)
            mask = (inst == inst_id)
            ys, xs = np.nonzero(mask)
            x1, y1 = int(xs.min()), int(ys.min())
            bw, bh = int(xs.max() - x1 + 1), int(ys.max() - y1 + 1)
            annotations.append(dict(
                id=ann_id, image_id=img_id, category_id=label_id,
                bbox=[x1, y1, bw, bh], area=int(mask.sum()),
                iscrowd=iscrowd,
                segmentation=mask_to_polygons(mask)))
            ann_id += 1
    categories = [dict(id=i, name=n) for i, n in INSTANCE_LABELS.items()]
    return dict(images=images, annotations=annotations,
                categories=categories)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", help="Cityscapes root (leftImg8bit/, gtFine/)")
    ap.add_argument("-o", "--out-dir", required=True)
    ap.add_argument("--splits", nargs="+", default=["train", "val"])
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    for split in args.splits:
        out = convert_split(args.root, split)
        path = os.path.join(args.out_dir,
                            f"instancesonly_filtered_gtFine_{split}.json")
        with open(path, "w") as f:
            json.dump(out, f)
        print(f"{split}: {len(out['images'])} images, "
              f"{len(out['annotations'])} instances -> {path}")


if __name__ == "__main__":
    main()

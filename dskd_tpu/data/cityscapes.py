"""Cityscapes detection dataset (parity: mmdet/datasets/cityscapes.py:338).

mmdet consumes Cityscapes through COCO-format instance annotations
(tools/dataset_converters/cityscapes.py produces them); the dataset class
is a CocoDataset fixed to the 8 traffic-participant classes plus a
class-wise AP summary. This mirrors that: a TaskCocoDataset bound to the
Cityscapes classes (single task), evaluating with the from-scratch COCO
protocol.
"""
from __future__ import annotations

from .coco import TaskCocoDataset

CITYSCAPES_CLASSES = ("person", "rider", "car", "truck", "bus", "train",
                      "motorcycle", "bicycle")


class CityscapesDataset(TaskCocoDataset):
    def __init__(self, ann_file: str, img_prefix: str = "",
                 test_mode: bool = False, **kw):
        super().__init__(ann_file, img_prefix,
                         catsplit=(len(CITYSCAPES_CLASSES),),
                         catload=(1,), test_mode=test_mode,
                         classes=CITYSCAPES_CLASSES,
                         class_order="given", **kw)

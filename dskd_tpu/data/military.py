"""HLKT / WRXT dataset bindings (parity: mmdet/datasets/hlkt.py:21,
mmdet/datasets/wrxt.py:23).

The reference's two private military/aerial datasets are COCO-format
CustomDataset subclasses with fixed class tuples and full
results2json/evaluate pipelines. The data itself is private; these
bindings give the same first-class surface on this framework's
TaskCocoDataset — including the incremental catsplit machinery the
reference drives over them — for anyone holding the annotation files.
Class order is the reference's given tuple order (not alphabetical):
both reference classes enumerate `self.CLASSES` directly against
`get_cat_ids(cat_names=...)`.
"""
from __future__ import annotations

from .coco import TaskCocoDataset

HLKT_CLASSES = ("Helicopter", "Panzer", "CruiseMissle", "Ship",
                "Surveillance", "Cargo", "Bomber", "BigUnmaned",
                "RevolveUnmaned", "Fighting")

WRXT_CLASSES = ("Fighter", "Helicopter", "Plane", "Aircraft", "Tank",
                "Armored", "SUV", "Launcher", "Solider")


class HLKTDataset(TaskCocoDataset):
    """10-class HLKT (hlkt.py:23-24)."""

    def __init__(self, ann_file: str, img_prefix: str = "",
                 catsplit=None, catload=None, **kw):
        catsplit = tuple(catsplit) if catsplit else (len(HLKT_CLASSES),)
        catload = tuple(catload) if catload else (1,) * len(catsplit)
        super().__init__(ann_file, img_prefix, catsplit=catsplit,
                         catload=catload, classes=HLKT_CLASSES,
                         class_order="given", **kw)


class WRXTDataset(TaskCocoDataset):
    """9-class WRXT (wrxt.py:23)."""

    def __init__(self, ann_file: str, img_prefix: str = "",
                 catsplit=None, catload=None, **kw):
        catsplit = tuple(catsplit) if catsplit else (len(WRXT_CLASSES),)
        catload = tuple(catload) if catload else (1,) * len(catsplit)
        super().__init__(ann_file, img_prefix, catsplit=catsplit,
                         catload=catload, classes=WRXT_CLASSES,
                         class_order="given", **kw)

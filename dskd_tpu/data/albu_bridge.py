"""Albumentations bridge (the reference's Albu transform,
pipelines/transforms.py:1321-1470), gated on the optional dependency.

The reference composes user-supplied albumentations transform dicts with a
'pascal_voc' bbox target and filters degenerate boxes afterwards. Same
contract here, as a host-side (img, boxes, labels) -> (img, boxes, labels)
function. albumentations is NOT vendored — constructing the bridge without
it raises an informative ImportError (the framework never imports this
module unless the config asks for Albu transforms).
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np


def build_albu(transforms: Sequence[dict], min_visibility: float = 0.0,
               min_area: float = 0.0):
    """Compose albumentations transforms; returns
    apply(img, boxes, labels) -> (img, boxes, labels)."""
    try:
        import albumentations as A
    except ImportError as e:
        raise ImportError(
            "the Albu pipeline bridge needs the optional 'albumentations' "
            "package (the reference has the same external dependency, "
            "transforms.py:1354-1360); install it or drop the Albu entry "
            "from the pipeline config") from e

    def build_one(cfg: dict):
        cfg = dict(cfg)
        t = cfg.pop("type")
        if t == "OneOf":
            return A.OneOf([build_one(c) for c in cfg.pop("transforms")],
                           **cfg)
        return getattr(A, t)(**cfg)

    comp = A.Compose(
        [build_one(c) for c in transforms],
        bbox_params=A.BboxParams(format="pascal_voc",
                                 label_fields=["labels"],
                                 min_visibility=min_visibility,
                                 min_area=min_area))

    def apply(img: np.ndarray, boxes: np.ndarray, labels: np.ndarray):
        out = comp(image=np.clip(img, 0, 255).astype(np.uint8),
                   bboxes=[tuple(b) for b in boxes],
                   labels=list(labels))
        new_boxes = np.asarray(out["bboxes"], np.float32).reshape(-1, 4)
        return (out["image"].astype(np.float32), new_boxes,
                np.asarray(out["labels"], labels.dtype
                           if hasattr(labels, "dtype") else np.int64))

    return apply

"""InstaBoost bridge (the reference's InstaBoost transform,
mmdet/datasets/pipelines/instaboost.py:1-118), gated on the optional
dependency exactly like the Albu bridge.

The reference delegates entirely to the external ``instaboostfast``
package: it builds an InstaBoostConfig from the transform kwargs, converts
COCO-style anns + the raw image through ``get_new_data`` with a
probability gate, and re-parses the returned anns. Same contract here as
a host-side (anns, img) -> (anns, img) function over COCO-format ann
dicts (bbox xywh + segmentation). ``instaboostfast`` is NOT vendored —
building the bridge without it raises an informative ImportError; the
framework never imports this module unless a config asks for InstaBoost.
"""
from __future__ import annotations

import numpy as np


def build_instaboost(action_candidate=("normal", "horizontal", "skip"),
                     action_prob=(1, 0, 0), scale=(0.8, 1.2), dx=15,
                     dy=15, theta=(-1, 1), color_prob=0.5, hflag=False,
                     aug_ratio=0.5):
    """Mirror of InstaBoost.__init__ (instaboost.py:35-54); returns
    apply(anns, img, rng) -> (anns, img)."""
    try:
        import instaboostfast as instaboost
    except ImportError as e:
        raise ImportError(
            "the InstaBoost bridge needs the optional 'instaboostfast' "
            "package (the reference has the same external dependency, "
            "instaboost.py:45-50); install it or drop instaboost from "
            "the data config") from e

    cfg = instaboost.InstaBoostConfig(action_candidate, action_prob,
                                      scale, dx, dy, theta, color_prob,
                                      hflag)

    def apply(anns, img: np.ndarray, rng):
        # instaboost.py:99-114: probability-gated, uint8 image in/out
        if rng.rand() >= aug_ratio:
            return anns, img
        new_anns, new_img = instaboost.get_new_data(
            anns, np.clip(img, 0, 255).astype(np.uint8), cfg,
            background=None)
        return new_anns, new_img.astype(np.float32)

    return apply

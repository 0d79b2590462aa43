"""Dataset wrappers (parity: mmdet/datasets/dataset_wrappers.py):
Concat / Repeat / ClassBalanced over any dataset exposing __len__ +
get_raw(idx)."""
from __future__ import annotations

import math
from collections import defaultdict
from typing import Sequence

import numpy as np


class ConcatDataset:
    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])
        first = self.datasets[0]
        for attr in ("CLASSES", "PRED_CLASSES", "LOAD_CLASSES",
                     "ALL_CLASSES_IDS", "cat2label", "label2cat"):
            if hasattr(first, attr):
                setattr(self, attr, getattr(first, attr))

    def __len__(self):
        return int(self._offsets[-1])

    def get_raw(self, idx):
        d = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[d].get_raw(idx - int(self._offsets[d]))


class RepeatDataset:
    def __init__(self, dataset, times: int):
        self.dataset = dataset
        self.times = times
        for attr in ("CLASSES", "PRED_CLASSES", "LOAD_CLASSES",
                     "ALL_CLASSES_IDS", "cat2label", "label2cat"):
            if hasattr(dataset, attr):
                setattr(self, attr, getattr(dataset, attr))

    def __len__(self):
        return len(self.dataset) * self.times

    def get_raw(self, idx):
        return self.dataset.get_raw(idx % len(self.dataset))


class ClassBalancedDataset:
    """Oversample images containing rare categories (LVIS-style
    category-repeat factors, oversample_thr as in the reference)."""

    def __init__(self, dataset, oversample_thr: float = 1e-3):
        self.dataset = dataset
        for attr in ("CLASSES", "PRED_CLASSES", "LOAD_CLASSES",
                     "ALL_CLASSES_IDS", "cat2label", "label2cat"):
            if hasattr(dataset, attr):
                setattr(self, attr, getattr(dataset, attr))

        n = len(dataset)
        cat_freq = defaultdict(float)
        img_cats = []
        for i in range(n):
            _, _, _, labels, _ = dataset.get_raw(i)
            cats = set(labels.tolist())
            img_cats.append(cats)
            for c in cats:
                cat_freq[c] += 1.0 / n
        cat_repeat = {c: max(1.0, math.sqrt(oversample_thr / f))
                      for c, f in cat_freq.items()}
        self._indices = []
        for i, cats in enumerate(img_cats):
            r = max((cat_repeat[c] for c in cats), default=1.0)
            self._indices.extend([i] * int(math.ceil(r)))

    def __len__(self):
        return len(self._indices)

    def get_raw(self, idx):
        return self.dataset.get_raw(self._indices[idx])

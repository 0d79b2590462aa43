"""DeepFashion class list (parity: mmdet datasets/deepfashion.py:8-11 —
a CocoDataset subclass that only swaps CLASSES). The single source for
both the shipped config and the mmdet-config importer."""

DEEPFASHION_CLASSES = (
    "top", "skirt", "leggings", "dress", "outer", "pants", "bag",
    "neckwear", "headwear", "eyeglass", "belt", "footwear", "hair",
    "skin", "face")

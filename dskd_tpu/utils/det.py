"""Shared detection-result structures for family eval steps.

Every family's jitted eval step returns a DetResults-compatible
structure (bboxes/scores/labels/valid, plus masks / mask_scores / seg
for the mask and panoptic families) — the contract eval/evaluator.py's
``evaluate`` consumes (reference analog: the per-class det_bboxes lists
returned by simple_test, mmdet/models/detectors/base.py).
"""
from collections import namedtuple

Det = namedtuple("Det", ["bboxes", "scores", "labels", "valid"])
DetM = namedtuple("DetM", ["bboxes", "scores", "labels", "valid", "masks"])
DetS = namedtuple("DetS", ["bboxes", "scores", "labels", "valid",
                           "masks", "mask_scores"])
DetP = namedtuple("DetP", ["bboxes", "scores", "labels", "valid",
                           "masks", "seg"])

"""CocoSplit x-class protocol tests."""
import json
import os

import numpy as np
import pytest

from dskd_tpu.data.coco import COCO_CLASSES_MMDET_ORDER
from dskd_tpu.data.coco_split import VOC_CLASS_NAMES, CocoSplitDataset


@pytest.fixture()
def split_json(tmp_path):
    cats = [{"id": cid, "name": n} for n, cid in COCO_CLASSES_MMDET_ORDER]
    images, anns = [], []
    # img1: person (VOC, id 1) + zebra (non-VOC, id 24)
    images.append({"id": 1, "file_name": "a.jpg", "width": 100,
                   "height": 100})
    anns.append({"id": 1, "image_id": 1, "category_id": 1,
                 "bbox": [0, 0, 30, 30], "area": 900, "iscrowd": 0})
    anns.append({"id": 2, "image_id": 1, "category_id": 24,
                 "bbox": [50, 50, 30, 30], "area": 900, "iscrowd": 0})
    path = tmp_path / "ann.json"
    with open(path, "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": cats}, f)
    return str(path)


def test_voc_names_valid():
    names = {n for n, _ in COCO_CLASSES_MMDET_ORDER}
    assert set(VOC_CLASS_NAMES) <= names
    assert len(VOC_CLASS_NAMES) == 20


def test_split_train_filtering(split_json):
    ds = CocoSplitDataset(split_json, train_class="voc",
                          eval_class="nonvoc")
    assert len(ds) == 1
    _, _, boxes, labels, _ = ds.get_raw(0)
    # only the person (VOC) annotation loads for training; class-agnostic
    assert len(boxes) == 1 and labels.tolist() == [0]


def test_xclass_evaluator_ignores_out_of_split(split_json):
    ds = CocoSplitDataset(split_json, train_class="voc",
                          eval_class="nonvoc", test_mode=True)
    ev = ds.make_evaluator(max_dets=(10, 100))
    # detect only the VOC person box: matched to an IGNORED gt -> not FP,
    # and the zebra gt unmatched -> recall 0 (1 valid gt, 0 found)
    ev.add_dt(1, np.array([[0, 0, 30, 30]]), [0.9], [0])
    stats = ev.summarize()
    assert stats["AR@100"] == pytest.approx(0.0, abs=1e-6)
    # now also detect the zebra -> recall 1
    ev2 = ds.make_evaluator(max_dets=(10, 100))
    ev2.add_dt(1, np.array([[0, 0, 30, 30], [50, 50, 80, 80]]),
               [0.9, 0.8], [0, 0])
    stats2 = ev2.summarize()
    assert stats2["AR@100"] == pytest.approx(1.0, abs=1e-6)


def test_results_io_roundtrip(tmp_path):
    from dskd_tpu.eval.results_io import (load_coco_results,
                                          results_to_coco_json)
    dets = {7: [np.array([[1, 2, 11, 22, 0.5]], np.float32),
                np.zeros((0, 5), np.float32)]}
    path = str(tmp_path / "res.json")
    results_to_coco_json(dets, {0: 101, 1: 102}, path)
    back = load_coco_results(path, {101: 0, 102: 1}, 2)
    np.testing.assert_allclose(back[7][0], dets[7][0], rtol=1e-6)

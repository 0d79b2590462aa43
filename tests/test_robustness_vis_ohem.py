"""Corruptions, robustness aggregation, error analysis, visualization, OHEM."""
import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools",
                                "analysis_tools"))

from dskd_tpu.core.max_iou_assigner import ohem_sample  # noqa: E402
from dskd_tpu.data.corruptions import CORRUPTIONS, corrupt  # noqa: E402
from dskd_tpu.utils.visualization import (get_palette,  # noqa: E402
                                          imshow_det_bboxes,
                                          imshow_gt_det_bboxes)
from robustness_eval import aggregate  # noqa: E402


def test_corruptions_run_and_differ():
    rng = np.random.RandomState(0)
    img = (rng.rand(48, 64, 3) * 255).astype(np.float32)
    for name in CORRUPTIONS:
        out = corrupt(img, name, 3)
        assert out.shape == img.shape
        assert out.min() >= 0 and out.max() <= 255
        assert np.abs(out - img).mean() > 0.1, name
        # higher severity => bigger deviation (monotone families)
        if name in ("gaussian_noise", "brightness", "contrast"):
            d1 = np.abs(corrupt(img, name, 1) - img).mean()
            d5 = np.abs(corrupt(img, name, 5) - img).mean()
            assert d5 > d1, name


def test_corruption_in_pipeline():
    from dskd_tpu.data.pipeline import PipelineConfig, preprocess

    rng = np.random.RandomState(0)
    img = (rng.rand(40, 52, 3) * 255).astype(np.float32)
    boxes = np.array([[5, 5, 25, 25]], np.float32)
    labels = np.array([1])
    base = PipelineConfig(img_scale=(64, 64), bucket=(64, 64), max_gt=4)
    corr = PipelineConfig(img_scale=(64, 64), bucket=(64, 64), max_gt=4,
                          corruption=("gaussian_noise", 4))
    a = preprocess(img, boxes, labels, base, None, train=False)
    b = preprocess(img, boxes, labels, corr, None, train=False)
    assert np.abs(a["image"] - b["image"]).max() > 0.05
    np.testing.assert_allclose(a["gt_bboxes"], b["gt_bboxes"])


def test_robustness_aggregate():
    results = {
        "gaussian_noise": {"0": {"bbox_mAP": 0.4},
                           "1": {"bbox_mAP": 0.3},
                           "2": {"bbox_mAP": 0.2}},
        "brightness": {"0": {"bbox_mAP": 0.4},
                       "1": {"bbox_mAP": 0.4},
                       "2": {"bbox_mAP": 0.3}},
    }
    agg = aggregate(results)
    assert agg["P"] == 0.4
    np.testing.assert_allclose(agg["per_corruption"]["gaussian_noise"], 0.25)
    np.testing.assert_allclose(agg["per_corruption"]["brightness"], 0.35)
    np.testing.assert_allclose(agg["mPC"], 0.3)
    np.testing.assert_allclose(agg["rPC"], 0.75)


def test_coco_error_analysis(tmp_path):
    from coco_error_analysis import analyze

    ann = {
        "images": [{"id": 1, "width": 100, "height": 100}],
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 2,
             "bbox": [50, 50, 20, 20], "area": 400, "iscrowd": 0},
        ],
    }
    results = [
        # exact hit on cat 1
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20],
         "score": 0.9},
        # cat-2 GT detected but labeled cat 1 (classification confusion):
        # scored ABOVE the true hit so it depresses the PR curve; counts
        # against C75/C50/Loc, forgiven by Oth
        {"image_id": 1, "category_id": 1, "bbox": [50, 50, 20, 20],
         "score": 0.95},
    ]
    ann_f, res_f = tmp_path / "ann.json", tmp_path / "res.json"
    ann_f.write_text(json.dumps(ann))
    res_f.write_text(json.dumps(results))
    report = analyze(str(ann_f), str(res_f), out_dir=str(tmp_path / "out"))
    c1 = report["classes"]["1"]
    assert c1["C75"] < c1["Oth"] <= c1["BG"] <= c1["FN"] == 1.0
    assert (tmp_path / "out" / "error_analysis.json").exists()
    assert report["mean"]["FN"] == 1.0


def test_visualization(tmp_path):
    img = np.zeros((40, 60, 3), np.uint8)
    boxes = np.array([[5, 5, 25, 30, 0.9]], np.float32)
    labels = np.array([0])
    drawn = imshow_det_bboxes(img, boxes, labels, class_names=["cat"],
                              out_file=str(tmp_path / "det.png"))
    assert drawn.shape == img.shape and drawn.sum() > 0
    assert (tmp_path / "det.png").exists()

    det_result = [np.array([[5, 5, 25, 30, 0.9]], np.float32)]
    both = imshow_gt_det_bboxes(img, boxes[:, :4], labels, det_result,
                                out_file=str(tmp_path / "gtdet.png"))
    assert both.shape == (40, 120, 3)
    assert len(get_palette("random", 5)) == 5
    assert get_palette((1, 2, 3), 2) == [(1, 2, 3), (1, 2, 3)]


def test_ohem_sample_picks_hardest():
    loss = jnp.asarray(np.array(
        [0.1, 5.0, 0.2, 9.0, 0.3, 7.0, 0.4, 1.0], np.float32))
    #           pos   neg  pos   neg  pos   neg  pos  neg  (by assignment)
    assigned = jnp.asarray(np.array([0, -1, 1, -1, 2, -1, 3, -1]))
    res = ohem_sample(loss, assigned, num=4, pos_fraction=0.5)
    # hardest 2 positives: indices 6 (0.4) and 4 (0.3)
    assert set(np.asarray(res.pos_idx).tolist()) == {6, 4}
    assert bool(res.pos_valid.all())
    # hardest 2 negatives: indices 3 (9.0) and 5 (7.0)
    assert set(np.asarray(res.neg_idx).tolist()) == {3, 5}
    assert bool(res.neg_valid.all())


def test_ohem_sample_scarce_groups():
    loss = jnp.asarray(np.array([1.0, 2.0, 3.0], np.float32))
    assigned = jnp.asarray(np.array([0, -1, -2]))   # -2 = ignored
    res = ohem_sample(loss, assigned, num=4, pos_fraction=0.5)
    assert int(res.pos_valid.sum()) == 1
    assert int(res.neg_valid.sum()) == 1
    assert np.asarray(res.neg_idx)[np.asarray(res.neg_valid)][0] == 1

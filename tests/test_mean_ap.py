"""VOC-style eval_map numeric oracles (hand-computed AP on a toy set;
mirrors the reference's tests/test_metrics/test_mean_ap.py strategy)."""
import numpy as np

from dskd_tpu.eval.mean_ap import (average_precision, eval_map, eval_recalls,
                                   tpfp_default)


def _toy():
    """1 class, 2 images, 3 GT, 4 dets -> TP,FP,TP,FP by descending score."""
    det_results = [
        # image 0: one perfect det (0.9), one miss (0.8)
        [np.array([[0, 0, 10, 10, 0.9],
                   [20, 20, 30, 30, 0.8]], np.float32)],
        # image 1: one perfect det (0.7) and its duplicate (0.6)
        [np.array([[0, 0, 10, 10, 0.7],
                   [0, 0, 10, 10, 0.6]], np.float32)],
    ]
    annotations = [
        dict(bboxes=np.array([[0, 0, 10, 10]], np.float32),
             labels=np.array([0])),
        dict(bboxes=np.array([[0, 0, 10, 10],
                              [20, 20, 30, 30]], np.float32),
             labels=np.array([0, 0])),
    ]
    return det_results, annotations


def test_eval_map_area_mode_hand_value():
    det, ann = _toy()
    mean_ap, results = eval_map(det, ann, iou_thr=0.5, mode="area")
    # cum tp = [1,1,2,2], fp = [0,1,1,2], 3 GT:
    # recalls [1/3,1/3,2/3,2/3], precisions [1,.5,2/3,.5]
    # envelope AP = 1/3*1 + 1/3*(2/3) = 5/9
    np.testing.assert_allclose(mean_ap, 5.0 / 9.0, atol=1e-6)
    assert results[0]["num_gts"] == 3 and results[0]["num_dets"] == 4


def test_eval_map_11points_hand_value():
    det, ann = _toy()
    mean_ap, _ = eval_map(det, ann, iou_thr=0.5, mode="11points")
    # max-precision at recall>=t: 1.0 for t in {0,.1,.2,.3}, 2/3 for
    # t in {.4,.5,.6}, 0 beyond -> (4 + 3*2/3)/11 = 6/11
    np.testing.assert_allclose(mean_ap, 6.0 / 11.0, atol=1e-6)


def test_tpfp_ignore_region_neither_tp_nor_fp():
    dets = np.array([[0, 0, 10, 10, 0.9]], np.float32)
    gts = np.empty((0, 4), np.float32)
    ignore = np.array([[0, 0, 10, 10]], np.float32)
    tp, fp = tpfp_default(dets, gts, ignore, iou_thr=0.5)
    assert tp.sum() == 0 and fp.sum() == 0


def test_tpfp_area_ranges():
    # a small (25 area) and a large (400 area) detection, no GT:
    # each is a FP only within its own area scale
    dets = np.array([[0, 0, 5, 5, 0.9], [0, 0, 20, 20, 0.8]], np.float32)
    gts = np.empty((0, 4), np.float32)
    tp, fp = tpfp_default(dets, gts, None, 0.5,
                          area_ranges=[(0, 100), (100, 1000)])
    np.testing.assert_array_equal(fp, [[1, 0], [0, 1]])
    assert tp.sum() == 0


def test_average_precision_perfect_detector():
    r = np.array([0.5, 1.0], np.float32)
    p = np.array([1.0, 1.0], np.float32)
    np.testing.assert_allclose(average_precision(r, p, "area"), 1.0)


def test_eval_recalls_basic():
    gts = [np.array([[0, 0, 10, 10]], np.float32),
           np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)]
    props = [np.array([[0, 0, 10, 10, 0.9]], np.float32),
             np.array([[0, 0, 10, 10, 0.8],
                       [50, 50, 60, 60, 0.7]], np.float32)]
    rec = eval_recalls(gts, props, proposal_nums=(1, 10), iou_thrs=(0.5,))
    # top-1: img0 covers its GT; img1 covers 1 of 2 -> 2/3
    np.testing.assert_allclose(rec[0, 0], 2.0 / 3.0, atol=1e-6)
    np.testing.assert_allclose(rec[1, 0], 1.0, atol=1e-6)


def test_print_map_summary(capsys):
    from dskd_tpu.eval.mean_ap import eval_map, print_map_summary

    dets = [[np.array([[0, 0, 10, 10, 0.9]], np.float32),
             np.zeros((0, 5), np.float32)]]
    anns = [dict(bboxes=np.array([[0, 0, 10, 10]], np.float32),
                 labels=np.array([0]))]
    mean_ap, results = eval_map(dets, anns)
    print_map_summary(mean_ap, results, class_names=["cat", "dog"])
    out = capsys.readouterr().out
    assert "cat" in out and "mAP" in out and "1.000" in out

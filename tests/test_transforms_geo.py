"""Geometric pipeline transforms: Expand, MinIoURandomCrop, RandomCrop,
ratio-range resize (pipelines/transforms.py semantics; SSD +
strong-baselines LSJ recipes)."""
import numpy as np

from dskd_tpu.data.pipeline import (PipelineConfig, expand_image,
                                    min_iou_random_crop, preprocess,
                                    random_crop)


def test_expand_shifts_boxes_and_fills_mean():
    rng = np.random.RandomState(1)
    img = np.full((20, 30, 3), 7.0, np.float32)
    boxes = np.array([[2.0, 3.0, 10.0, 12.0]], np.float32)
    mean = np.array([1.0, 2.0, 3.0], np.float32)
    for _ in range(20):
        out, nb = expand_image(img, boxes, rng, mean, (1.5, 3.0))
        if out.shape == img.shape:        # the p=0.5 skip branch
            np.testing.assert_array_equal(nb, boxes)
            continue
        eh, ew = out.shape[:2]
        assert 20 * 1.5 <= eh <= 20 * 3.0 and 30 * 1.5 <= ew <= 30 * 3.0
        left = nb[0, 0] - boxes[0, 0]
        top = nb[0, 1] - boxes[0, 1]
        assert left == nb[0, 2] - boxes[0, 2]
        assert top == nb[0, 3] - boxes[0, 3]
        li, ti = int(left), int(top)
        # the pasted region is the original image
        np.testing.assert_array_equal(out[ti:ti + 20, li:li + 30], img)
        # a corner outside the paste is mean-filled
        if ti > 0 and li > 0:
            np.testing.assert_array_equal(out[0, 0], mean)


def test_min_iou_crop_keeps_center_in_patch():
    rng = np.random.RandomState(0)
    img = np.arange(40 * 60 * 3, dtype=np.float32).reshape(40, 60, 3)
    boxes = np.array([[5.0, 5.0, 20.0, 20.0],
                      [30.0, 10.0, 55.0, 35.0]], np.float32)
    labels = np.array([1, 2], np.int32)
    saw_crop = False
    for _ in range(30):
        ci, cb, cl = min_iou_random_crop(img, boxes, labels, rng)
        ch, cw = ci.shape[:2]
        assert len(cb) == len(cl) and len(cb) >= 1
        if (ch, cw) != (40, 60):
            saw_crop = True
            # min_crop_size floor + aspect window
            assert ch >= 0.3 * 40 - 1 and cw >= 0.3 * 60 - 1
            assert 0.5 <= ch / cw <= 2.0 + 1e-6
        # surviving boxes live inside the crop
        assert (cb[:, 0] >= 0).all() and (cb[:, 1] >= 0).all()
        assert (cb[:, 2] <= cw).all() and (cb[:, 3] <= ch).all()
        assert (cb[:, 2] > cb[:, 0]).all() and (cb[:, 3] > cb[:, 1]).all()
        assert set(cl.tolist()) <= {1, 2}
    assert saw_crop, "crop branch never taken in 30 draws"


def test_random_crop_clips_and_drops():
    rng = np.random.RandomState(3)
    img = np.zeros((50, 50, 3), np.float32)
    boxes = np.array([[0.0, 0.0, 49.0, 49.0],     # survives any crop
                      [48.0, 48.0, 49.5, 49.5]], np.float32)
    labels = np.array([0, 1], np.int32)
    ci, cb, cl = random_crop(img, boxes, labels, rng, (20, 20))
    assert ci.shape[:2] == (20, 20)
    assert (cb >= 0).all() and (cb <= 20).all()
    assert (cb[:, 2] > cb[:, 0]).all() and (cb[:, 3] > cb[:, 1]).all()
    assert len(cb) == len(cl)
    # allow_negative_crop: zero boxes is a legal outcome
    ci2, cb2, cl2 = random_crop(
        img, np.zeros((0, 4), np.float32), np.zeros((0,), np.int32),
        rng, (20, 20))
    assert len(cb2) == 0 and ci2.shape[:2] == (20, 20)
    # crop larger than the image degrades to the full image
    ci3, _, _ = random_crop(img, boxes, labels, rng, (80, 80))
    assert ci3.shape[:2] == (50, 50)


def test_preprocess_ssd_recipe_static_shapes():
    cfg = PipelineConfig(img_scale=(64, 64), bucket=(64, 64), max_gt=8,
                         expand=True, min_iou_crop=True)
    rng = np.random.RandomState(0)
    img = rng.rand(48, 64, 3).astype(np.float32) * 255
    boxes = np.array([[4.0, 4.0, 30.0, 30.0],
                      [10.0, 8.0, 44.0, 40.0]], np.float32)
    labels = np.array([3, 5], np.int32)
    for seed in range(5):
        out = preprocess(img, boxes, labels, cfg,
                         np.random.RandomState(seed), train=True)
        assert out["image"].shape == (64, 64, 3)
        assert out["gt_bboxes"].shape == (8, 4)
        v = out["gt_valid"]
        b = out["gt_bboxes"][v]
        hw = out["img_hw"]
        assert (b[:, 2] <= hw[1] + 1e-3).all()
        assert (b[:, 3] <= hw[0] + 1e-3).all()


def test_preprocess_lsj_recipe_static_shapes():
    cfg = PipelineConfig(img_scale=(64, 64), bucket=(64, 64), max_gt=8,
                         resize_ratio_range=(0.1, 2.0),
                         random_crop=(64, 64))
    rng = np.random.RandomState(0)
    img = rng.rand(48, 72, 3).astype(np.float32) * 255
    boxes = np.array([[4.0, 4.0, 30.0, 30.0]], np.float32)
    labels = np.array([2], np.int32)
    sizes = set()
    for seed in range(8):
        out = preprocess(img, boxes, labels, cfg,
                         np.random.RandomState(seed), train=True)
        assert out["image"].shape == (64, 64, 3)
        h, w = out["img_hw"]
        assert h <= 64 and w <= 64
        sizes.add((int(h), int(w)))
    assert len(sizes) > 1, "ratio_range produced no scale variety"


def test_lsj_masks_follow_crop():
    """with_mask + random_crop: the rasterized mask must track its box
    through the resize+crop (a box-filled square polygon stays aligned
    with gt_bboxes on the canvas)."""
    cfg = PipelineConfig(img_scale=(64, 64), bucket=(64, 64), max_gt=4,
                         resize_ratio_range=(1.0, 2.0),
                         random_crop=(64, 64), with_mask=True,
                         mask_stride=4, flip_ratio=0.0)
    img = np.zeros((64, 64, 3), np.float32)
    # one big square instance [8, 8, 56, 56]
    seg = [[8.0, 8.0, 56.0, 8.0, 56.0, 56.0, 8.0, 56.0]]
    boxes = np.array([[8.0, 8.0, 56.0, 56.0]], np.float32)
    labels = np.array([1], np.int32)
    hits = 0
    for seed in range(8):
        out = preprocess(img, boxes, labels, cfg,
                         np.random.RandomState(seed), train=True,
                         segmentations=[seg])
        if not out["gt_valid"][0]:
            continue          # crop legitimately dropped the box
        hits += 1
        m = out["gt_masks"][0]                      # (16, 16)
        b = out["gt_bboxes"][0] / 4.0               # stride-4 coords
        ys, xs = np.nonzero(m > 0.5)
        assert len(ys), "mask empty while box survived"
        # mask extent within ~1 cell of the box extent
        assert abs(xs.min() - b[0]) <= 1.5 and abs(ys.min() - b[1]) <= 1.5
        assert abs(xs.max() + 1 - b[2]) <= 1.5
        assert abs(ys.max() + 1 - b[3]) <= 1.5
    assert hits >= 3


def test_lsj_semantic_follows_crop():
    cfg = PipelineConfig(img_scale=(64, 64), bucket=(64, 64), max_gt=4,
                         resize_ratio_range=(1.0, 1.0),
                         random_crop=(32, 32), with_semantic=True,
                         mask_stride=4, flip_ratio=0.0)
    img = np.zeros((64, 64, 3), np.float32)
    semantic = np.zeros((64, 64), np.int32)
    semantic[:, 32:] = 7              # right half is class 7
    boxes = np.array([[0.0, 0.0, 60.0, 60.0]], np.float32)
    labels = np.array([0], np.int32)
    seen = set()
    for seed in range(10):
        out = preprocess(img, boxes, labels, cfg,
                         np.random.RandomState(seed), train=True,
                         semantic=semantic)
        sem = out["gt_semantic"]
        live = sem[sem != 255]
        assert set(np.unique(live)).issubset({0, 7})
        seen |= set(np.unique(live).tolist())
    # across crops both halves must appear (offsets vary)
    assert seen == {0, 7}

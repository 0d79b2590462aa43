"""Dataset + pipeline tests with tiny synthetic COCO JSON fixtures
(mirrors the reference's tests/test_data strategy)."""
import json
import os

import numpy as np
import pytest

from dskd_tpu.data.coco import (COCO_CLASSES_ALPHA_ORDER, TaskCocoDataset)
from dskd_tpu.data.pipeline import PipelineConfig, preprocess, rescale_size


def make_coco_json(tmpdir, num_images=6):
    """Synthetic annotations over a few known categories."""
    cats = [{"id": cid, "name": n} for n, cid in COCO_CLASSES_ALPHA_ORDER]
    images, annotations = [], []
    aid = 1
    # airplane=5(label0), apple=53(label1), backpack=27(label2) in alpha order
    use = [5, 53, 27, 52]
    for i in range(num_images):
        images.append({"id": i + 1, "file_name": f"img{i}.jpg",
                       "width": 100, "height": 80})
        cat = use[i % len(use)]
        annotations.append({
            "id": aid, "image_id": i + 1, "category_id": cat,
            "bbox": [10, 10, 30, 20], "area": 600, "iscrowd": 0})
        aid += 1
    path = os.path.join(tmpdir, "ann.json")
    with open(path, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": cats}, f)
    return path


def test_alpha_order_matches_reference_convention():
    names = [n for n, _ in COCO_CLASSES_ALPHA_ORDER]
    assert names == sorted(names)
    assert names[0] == "airplane" and names[-1] == "zebra"
    ids = dict(COCO_CLASSES_ALPHA_ORDER)
    # spot values from the reference's COCO_CATS_IDS table
    assert ids["airplane"] == 5 and ids["person"] == 1 and ids["zebra"] == 24


def test_task_split_contract(tmp_path):
    ann = make_coco_json(str(tmp_path))
    # 2-task split over the first 4 alpha classes; task1 = first 2 classes
    ds1 = TaskCocoDataset(ann, catsplit=(2, 2), catload=(1, 0))
    assert ds1.TASK_CLASSES[0] == ("airplane", "apple")
    assert ds1.LOAD_CLASSES == ["airplane", "apple"]
    assert ds1.PRED_CLASSES == ["airplane", "apple"]
    assert ds1.cat2label[5] == 0 and ds1.cat2label[53] == 1
    # only images containing airplane(5)/apple(53) annotations survive
    for i in range(len(ds1)):
        _, _, _, labels, _ = ds1.get_raw(i)
        assert set(labels.tolist()) <= {0, 1}

    # task 2 train: only the new classes loaded
    ds2 = TaskCocoDataset(ann, catsplit=(2, 2), catload=(0, 1))
    assert ds2.LOAD_CLASSES == ["backpack", "banana"]
    assert ds2.PRED_CLASSES == ["airplane", "apple", "backpack", "banana"]
    for i in range(len(ds2)):
        _, _, _, labels, _ = ds2.get_raw(i)
        assert set(labels.tolist()) <= {2, 3}

    # task 2 val: tril load -> both tasks
    dsv = TaskCocoDataset(ann, catsplit=(2, 2), catload=(1, 1),
                          test_mode=True)
    assert dsv.LOAD_CLASSES == ["airplane", "apple", "backpack", "banana"]


def test_rescale_size_keep_ratio():
    # 480x640 into (640, 640): factor 1.0
    assert rescale_size(480, 640, (640, 640)) == (480, 640, 1.0)
    # 800x1000 into (640, 640): factor 0.64
    h, w, f = rescale_size(800, 1000, (640, 640))
    assert (h, w) == (512, 640)


def test_preprocess_static_shapes():
    cfg = PipelineConfig(max_gt=10, bucket=(640, 640))
    img = np.random.RandomState(0).randint(
        0, 255, (480, 640, 3)).astype(np.uint8)
    boxes = np.array([[10, 10, 100, 100], [0, 0, 640, 480]], np.float32)
    labels = np.array([1, 2], np.int32)
    out = preprocess(img, boxes, labels, cfg, rng=None, train=False)
    assert out["image"].shape == (640, 640, 3)
    assert out["gt_bboxes"].shape == (10, 4)
    assert out["gt_valid"].sum() == 2
    assert tuple(out["img_hw"]) == (480, 640)
    # normalized: roughly zero-mean
    assert abs(out["image"][:480].mean()) < 1.0


def test_preprocess_flip_boxes():
    cfg = PipelineConfig(max_gt=4, bucket=(64, 64), img_scale=(64, 64),
                         flip_ratio=1.0)
    img = np.zeros((64, 64, 3), np.uint8)
    boxes = np.array([[0, 0, 10, 10]], np.float32)
    labels = np.array([0], np.int32)
    out = preprocess(img, boxes, labels, cfg,
                     rng=np.random.RandomState(0), train=True)
    np.testing.assert_allclose(out["gt_bboxes"][0], [54, 0, 64, 10])


def test_loader_prefetch_overlaps_consumer(tmp_path, monkeypatch):
    """Batch N+1 must be built by the producer thread WHILE the consumer
    holds batch N (the reference overlaps via torch DataLoader workers,
    datasets/builder.py:176-240)."""
    import time

    import dskd_tpu.data.loader as loader_mod
    from dskd_tpu.data.loader import DataLoader

    ann = make_coco_json(str(tmp_path), num_images=8)
    ds = TaskCocoDataset(ann, catsplit=(4,), catload=(1,))
    assert len(ds) >= 6

    load_events = []

    def fake_load_image(path):
        load_events.append(time.monotonic())
        return np.zeros((40, 50, 3), np.uint8)

    monkeypatch.setattr(loader_mod, "load_image", fake_load_image)
    dl = DataLoader(ds, batch_size=2,
                    pipeline=PipelineConfig(max_gt=4, bucket=(32, 32),
                                            img_scale=(32, 32)),
                    train=True, num_workers=2, prefetch=2)
    it = iter(dl)
    batch0, _ = next(it)
    assert batch0.images.shape == (2, 32, 32, 3)
    t_sleep_start = time.monotonic()
    time.sleep(0.5)  # consumer "runs the device step"
    n_during_sleep = sum(1 for t in load_events if t >= t_sleep_start)
    # the producer must have kept loading while we slept; with the old
    # synchronous prefetch nothing loads between yields
    batch1, _ = next(it)
    assert batch1.images.shape == (2, 32, 32, 3)
    assert n_during_sleep >= 0  # events may all predate the sleep (fast
    # producer already filled the queue); the real assertion:
    # by the time we ask for batch 1 it must already be built
    t_ask = time.monotonic()
    assert t_ask - t_sleep_start >= 0.5
    # all loads for batches 0..2 (prefetch=2 ahead) happened before the
    # consumer asked for batch 1
    assert len(load_events) >= 4, load_events
    assert max(load_events) < t_ask - 0.4, (
        "producer did not run ahead during the consumer's step")
    list(it)  # drain cleanly


def test_loader_gt_buckets(tmp_path, monkeypatch):
    """GT-count bucketing: batches pad GT to the smallest bucket covering
    the batch's last valid slot instead of always max_gt, preserving every
    valid box (DataConfig.gt_buckets; the dynamic-shape equivalent of the
    reference's exact per-image GT tensors)."""
    import dskd_tpu.data.loader as loader_mod
    from dskd_tpu.data.loader import DataLoader

    ann = make_coco_json(str(tmp_path), num_images=8)
    ds = TaskCocoDataset(ann, catsplit=(4,), catload=(1,))
    monkeypatch.setattr(loader_mod, "load_image",
                        lambda path: np.zeros((40, 50, 3), np.uint8))
    pipe = PipelineConfig(max_gt=64, bucket=(32, 32), img_scale=(32, 32))
    dl_full = DataLoader(ds, batch_size=2, pipeline=pipe, train=False,
                         num_workers=1)
    dl_bkt = DataLoader(ds, batch_size=2, pipeline=pipe, train=False,
                        num_workers=1, gt_buckets=(4, 8, 16))
    for (bf, _), (bb, _) in zip(iter(dl_full), iter(dl_bkt)):
        assert bf.gt_bboxes.shape[1] == 64
        nb = bb.gt_bboxes.shape[1]
        assert nb in (4, 8, 16)
        # every valid GT survives the trim, bit-identically
        assert bf.gt_valid[:, nb:].sum() == 0
        np.testing.assert_array_equal(bb.gt_valid, bf.gt_valid[:, :nb])
        np.testing.assert_array_equal(bb.gt_bboxes, bf.gt_bboxes[:, :nb])
        np.testing.assert_array_equal(bb.gt_labels, bf.gt_labels[:, :nb])


def test_instaboost_bridge_gates_on_missing_package():
    """InstaBoost delegates to the external instaboostfast package (the
    reference has the identical optional dependency); without it the
    bridge must fail loud at BUILD time, not at apply time."""
    import pytest

    from dskd_tpu.data.instaboost_bridge import build_instaboost
    try:
        import instaboostfast  # noqa: F401
        pytest.skip("instaboostfast unexpectedly installed")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="instaboostfast"):
        build_instaboost()


def test_dskd_datasets_env_rewrites_data_root(tmp_path, monkeypatch):
    """DSKD_DATASETS re-roots the conventional data/ paths (parity:
    mmdet utils/misc.py update_data_root + MMDET_DATASETS)."""
    import os

    from dskd_tpu.utils.config import load_config
    path = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "faster_rcnn_r50_1x.py")
    monkeypatch.setenv("DSKD_DATASETS", "/mnt/disks/coco")
    cfg = load_config(path)
    assert cfg.data.train_ann.startswith("/mnt/disks/coco/coco/")
    assert cfg.data.val_img_prefix.startswith("/mnt/disks/coco/coco/")
    monkeypatch.delenv("DSKD_DATASETS")
    cfg2 = load_config(path)
    assert cfg2.data.train_ann.startswith("data/coco/")

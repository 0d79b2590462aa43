"""DataConfig.dataset_type driver bindings (voc / lvis / ...).

Parity target: mmdet's dataset_type registry dispatch — the reference
trains pascal_voc / wider_face / lvis / openimages / cityscapes configs
by swapping the dataset class; here make_datasets branches on
``cfg.data.dataset_type`` and the eval path routes non-COCO types
through the dataset's OWN evaluate() protocol
(eval/evaluator.py:evaluate_dataset_native).
"""
import json
import os

import numpy as np
import pytest

from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def _write_voc(root, img_id, hw, objects, with_jpg=True):
    import cv2
    os.makedirs(os.path.join(root, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets", "Main"), exist_ok=True)
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    objs = "".join(
        f"<object><name>{n}</name><difficult>0</difficult>"
        f"<bndbox><xmin>{b[0]}</xmin><ymin>{b[1]}</ymin>"
        f"<xmax>{b[2]}</xmax><ymax>{b[3]}</ymax></bndbox></object>"
        for n, b in objects)
    xml = (f"<annotation><size><width>{hw[1]}</width>"
           f"<height>{hw[0]}</height></size>{objs}</annotation>")
    with open(os.path.join(root, "Annotations", f"{img_id}.xml"), "w") as f:
        f.write(xml)
    if with_jpg:
        cv2.imwrite(os.path.join(root, "JPEGImages", f"{img_id}.jpg"),
                    np.random.RandomState(0).randint(
                        0, 255, (*hw, 3), np.uint8))


def _voc_cfg(root):
    return ExperimentConfig(
        model=ModelConfig(arch="faster_rcnn", num_classes=20, depth=18,
                          frozen_stages=-1),
        data=DataConfig(dataset_type="voc", data_root=root,
                        train_split="trainval", val_split="test",
                        voc_year="2007", catsplit=(20,),
                        samples_per_device=1, num_workers=1, max_gt=4,
                        bucket=(64, 64), img_scale=(64, 64),
                        aspect_buckets=None),
        train=TrainConfig(epochs_per_task=1, warmup_iters=2),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )


@pytest.fixture()
def voc_root(tmp_path):
    root = str(tmp_path / "VOC2007")
    _write_voc(root, "000001", (60, 64), [("dog", (10, 10, 30, 40)),
                                          ("cat", (35, 5, 60, 30))])
    _write_voc(root, "000002", (64, 60), [("person", (5, 5, 40, 40))])
    for split, ids in (("trainval", ["000001", "000002"]),
                       ("test", ["000001", "000002"])):
        with open(os.path.join(root, "ImageSets", "Main",
                               f"{split}.txt"), "w") as f:
            f.write("\n".join(ids) + "\n")
    return root


def test_make_datasets_voc_dispatch(voc_root):
    from dskd_tpu.data.voc import VOCDataset
    from dskd_tpu.train.incremental import make_datasets

    cfg = _voc_cfg(voc_root)
    train_ds, val_ds = make_datasets(cfg, 1, 1)
    assert isinstance(train_ds, VOCDataset)
    assert len(train_ds) == 2 and len(val_ds) == 2
    # multi-task catsplit must be rejected for single-task bindings
    cfg.data.catsplit = (10, 10)
    with pytest.raises(ValueError):
        make_datasets(cfg, 1, 2)


def test_voc_loader_and_native_eval(voc_root):
    """Full surface: VOC dataset -> DataLoader batch -> model inference
    -> the devkit's own 11-point mAP via evaluate_dataset_native."""
    import jax

    from dskd_tpu.data.loader import DataLoader
    from dskd_tpu.data.pipeline import PipelineConfig
    from dskd_tpu.eval.evaluator import evaluate_dataset_native
    from dskd_tpu.train.incremental import (build_model, init_variables,
                                            make_datasets)

    cfg = _voc_cfg(voc_root)
    _, val_ds = make_datasets(cfg, 1, 1)
    pipe = PipelineConfig(img_scale=(64, 64), bucket=(64, 64), max_gt=4)
    loader = DataLoader(val_ds, 1, pipe, train=False, num_workers=1,
                        drop_last=False)
    model = build_model(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    stats = evaluate_dataset_native(model, variables, val_ds, loader,
                                    cfg.model.num_classes, "voc",
                                    arch="faster_rcnn", max_per_img=10)
    assert "mAP" in stats and np.isfinite(stats["mAP"])


def test_make_datasets_lvis_dispatch(tmp_path):
    from dskd_tpu.data.lvis import LvisDataset
    from dskd_tpu.train.incremental import make_datasets

    ann = {
        "images": [{"id": 1, "file_name": "a.jpg", "width": 32,
                    "height": 32, "neg_category_ids": []}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 7,
                         "bbox": [2, 2, 10, 10], "area": 100,
                         "segmentation": [[2, 2, 12, 2, 12, 12, 2, 12]]}],
        "categories": [{"id": 7, "name": "aerosol_can",
                        "frequency": "c"}],
    }
    p = tmp_path / "lvis.json"
    p.write_text(json.dumps(ann))
    cfg = _voc_cfg(str(tmp_path))
    cfg.data.dataset_type = "lvis"
    cfg.data.train_ann = cfg.data.val_ann = str(p)
    cfg.data.train_img_prefix = cfg.data.val_img_prefix = str(tmp_path)
    train_ds, val_ds = make_datasets(cfg, 1, 1)
    assert isinstance(train_ds, LvisDataset)
    # mask path: segmentation payloads aligned with get_raw boxes
    segs = train_ds.get_segmentations(0)
    assert len(segs) == 1 and segs[0] is not None


def test_custom_classes_binding_deepfashion(tmp_path):
    """DataConfig.classes drives the CocoDataset-subclass pattern
    (datasets/deepfashion.py: a CLASSES swap over the COCO loader)."""
    from dskd_tpu.train.incremental import make_datasets
    from dskd_tpu.utils.config import load_config

    names = ["top", "skirt", "bag"]
    ann = {
        "images": [{"id": 1, "file_name": "a.jpg", "width": 32,
                    "height": 32}],
        "annotations": [
            {"id": i + 1, "image_id": 1, "category_id": i + 1,
             "bbox": [2, 2 + 6 * i, 10, 5], "area": 50, "iscrowd": 0}
            for i in range(3)],
        "categories": [{"id": i + 1, "name": n}
                       for i, n in enumerate(names)],
    }
    p = tmp_path / "df.json"
    p.write_text(json.dumps(ann))
    import os
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs",
                                   "mask_rcnn_r50_deepfashion.py"))
    cfg.data.classes = tuple(names)
    cfg.data.catsplit = (3,)
    cfg.data.train_ann = cfg.data.val_ann = str(p)
    cfg.data.train_img_prefix = cfg.data.val_img_prefix = str(tmp_path)
    train_ds, val_ds = make_datasets(cfg, 1, 1)
    # alpha order over the custom names (the IL convention)
    assert train_ds.CLASSES == ("bag", "skirt", "top")
    assert val_ds.CLASSES == ("bag", "skirt", "top")
    _, _, boxes, labels, _ = train_ds.get_raw(0)
    assert len(boxes) == 3 and sorted(labels.tolist()) == [0, 1, 2]


def test_make_datasets_hlkt_wrxt_incremental_dispatch(tmp_path):
    """HLKT/WRXT bindings (hlkt.py:21, wrxt.py:23): given-order class
    tuples + the full incremental catsplit machinery (the reference
    trains these datasets with the same task loop as COCO)."""
    from dskd_tpu.data.military import (HLKT_CLASSES, WRXT_CLASSES,
                                        HLKTDataset, WRXTDataset)
    from dskd_tpu.train.incremental import make_datasets

    for dt, names, cls in (("hlkt", HLKT_CLASSES, HLKTDataset),
                           ("wrxt", WRXT_CLASSES, WRXTDataset)):
        ann = {
            "images": [{"id": 1, "file_name": "a.jpg", "width": 32,
                        "height": 32}],
            "annotations": [
                {"id": i + 1, "image_id": 1, "category_id": i + 1,
                 "bbox": [2, 2, 10, 5], "area": 50, "iscrowd": 0}
                for i in range(len(names))],
            "categories": [{"id": i + 1, "name": n}
                           for i, n in enumerate(names)],
        }
        p = tmp_path / f"{dt}.json"
        p.write_text(json.dumps(ann))
        cfg = _voc_cfg(str(tmp_path))
        cfg.data.dataset_type = dt
        n1 = len(names) // 2
        cfg.data.catsplit = (n1, len(names) - n1)
        cfg.data.train_ann = cfg.data.val_ann = str(p)
        cfg.data.train_img_prefix = str(tmp_path)
        cfg.data.val_img_prefix = str(tmp_path)

        train_ds, val_ds = make_datasets(cfg, 2, 2)
        assert isinstance(train_ds, cls)
        # given order, NOT alphabetical (both reference classes index
        # self.CLASSES directly)
        assert train_ds.CLASSES == tuple(names)
        # task 2 trains only the second class group; val sees both
        assert tuple(train_ds.LOAD_CLASSES) == tuple(names[n1:])
        assert tuple(val_ds.LOAD_CLASSES) == tuple(names)
        assert tuple(train_ds.TASK_CLASSES[0]) == tuple(names[:n1])

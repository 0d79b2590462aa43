"""Smoke tests for the tools/misc debug scripts (reference misc_my
equivalents: check_annotate_detection, check_dataset_augment,
get_dataset_augment_cfg) on the synthetic tiny-COCO fixture."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from dskd_tpu.data.coco import COCO_CLASSES_ALPHA_ORDER

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools", "misc")


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("misc_coco")
    img_dir = root / "images"
    img_dir.mkdir()
    cats = [{"id": cid, "name": n} for n, cid in COCO_CLASSES_ALPHA_ORDER]
    use = [5, 53]
    images, annotations = [], []
    rng = np.random.RandomState(0)
    for i in range(4):
        name = f"img{i}.jpg"
        cv2.imwrite(str(img_dir / name),
                    rng.randint(0, 255, (64, 80, 3), np.uint8))
        images.append({"id": i + 1, "file_name": name,
                       "width": 80, "height": 64})
        annotations.append({
            "id": i + 1, "image_id": i + 1, "category_id": use[i % 2],
            "bbox": [5, 5, 20, 20], "area": 400, "iscrowd": 0})
    ann = root / "ann.json"
    ann.write_text(json.dumps({"images": images,
                               "annotations": annotations,
                               "categories": cats}))
    cfg = root / "cfg.py"
    cfg.write_text(f'''
from dskd_tpu.utils.config import (DataConfig, ExperimentConfig,
                                   ModelConfig, TrainConfig)


def get_config():
    return ExperimentConfig(
        model=ModelConfig(num_classes=2, depth=18),
        data=DataConfig(train_ann={str(ann)!r}, val_ann={str(ann)!r},
                        train_img_prefix={str(img_dir)!r},
                        val_img_prefix={str(img_dir)!r},
                        catsplit=(1, 1), max_gt=8, bucket=(64, 64),
                        img_scale=(64, 64)),
        train=TrainConfig(work_dir={str(root / "work")!r}),
    )
''')
    return str(cfg), str(root)


def _run(script, *args):
    repo = os.path.join(os.path.dirname(__file__), "..")
    return subprocess.run(
        [sys.executable, os.path.join(TOOLS, script), *args],
        capture_output=True, text=True, timeout=300, cwd=repo,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": repo})


def test_check_annotate(tiny_setup, tmp_path):
    cfg, _ = tiny_setup
    out = tmp_path / "vis"
    r = _run("check_annotate_detection.py", cfg, "--which", "annotate",
             "--num", "2", "--output-dir", str(out))
    assert r.returncode == 0, r.stderr
    assert len(list(out.glob("annotate_*.jpg"))) == 2


def test_check_dataset_augment(tiny_setup, tmp_path):
    cfg, _ = tiny_setup
    out = tmp_path / "aug"
    r = _run("check_dataset_augment.py", cfg, "--num", "2",
             "--manual-aug", "v2", "--output-dir", str(out))
    assert r.returncode == 0, r.stderr
    assert len(list(out.glob("*_orig.jpg"))) == 2
    assert len(list(out.glob("*_aug.jpg"))) == 2


def test_get_dataset_augment_cfg(tiny_setup):
    cfg, _ = tiny_setup
    r = _run("get_dataset_augment_cfg.py", cfg)
    assert r.returncode == 0, r.stderr
    assert "dataset:" in r.stdout and "transform:" in r.stdout

"""End-to-end 2-task incremental training on a synthetic COCO dataset.

Covers the full driver loop (tools/train_increment.py equivalent): task 1
plain detection -> teacher promotion -> task 2 with the DSKD distill menu ->
task-aware checkpoints -> evaluation, all on tiny shapes over the 8-device
CPU mesh. The reference has no IL test at all (SURVEY §4) — this is the
2-task toy-split check it recommends adding.
"""
import json
import os

import numpy as np
import pytest

from dskd_tpu.data.coco import COCO_CLASSES_ALPHA_ORDER


@pytest.fixture(scope="module")
def synthetic_coco(tmp_path_factory):
    """16 images, 4 alpha-first classes (2 per task), boxes on disk."""
    import cv2

    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    img_dir.mkdir()
    cats = [{"id": cid, "name": n} for n, cid in COCO_CLASSES_ALPHA_ORDER]
    use = [5, 53, 27, 52]   # airplane, apple, backpack, banana (labels 0-3)
    images, annotations = [], []
    rng = np.random.RandomState(0)
    aid = 1
    for i in range(16):
        name = f"img{i}.jpg"
        arr = rng.randint(0, 255, (64, 80, 3), np.uint8)
        cv2.imwrite(str(img_dir / name), arr)
        images.append({"id": i + 1, "file_name": name,
                       "width": 80, "height": 64})
        for j in range(2):
            cat = use[(i + j) % len(use)]
            x, y = rng.randint(0, 40, 2)
            w, h = rng.randint(10, 24, 2)
            annotations.append({
                "id": aid, "image_id": i + 1, "category_id": int(cat),
                "bbox": [int(x), int(y), int(w), int(h)],
                "area": int(w * h), "iscrowd": 0})
            aid += 1
    ann = root / "ann.json"
    with open(ann, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": cats}, f)
    return str(ann), str(img_dir), str(root)


def test_two_task_incremental_run(synthetic_coco):
    ann, img_dir, root = synthetic_coco

    from dskd_tpu.train.incremental import run_incremental
    from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                       ExperimentConfig, ModelConfig,
                                       TrainConfig)

    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=4, num_query=16, depth=18,
                          num_encoder_layers=1, num_decoder_layers=1,
                          num_levels=4, dropout=0.0),
        data=DataConfig(train_ann=ann, val_ann=ann,
                        train_img_prefix=img_dir, val_img_prefix=img_dir,
                        catsplit=(2, 2), samples_per_device=1,
                        num_workers=2, max_gt=8, bucket=(64, 64),
                        img_scale=(64, 64)),
        train=TrainConfig(base_lr=1e-4, warmup_iters=2, epochs_per_task=1,
                          step_epochs=(10,), eval_interval=1,
                          ckpt_interval=1, log_interval=1,
                          work_dir=os.path.join(root, "work"),
                          use_dropout=False),
        distill=DistillFlags(cates_distill="hard + teacher-first",
                             feats_distill="corr + fg_info + decode_v1",
                             teacher_score_thr=0.05,
                             teacher_max_per_img=8),
    )
    variables = run_incremental(cfg)
    assert "params" in variables
    # task-aware checkpoints exist
    assert os.path.isdir(os.path.join(root, "work", "task_1_epoch_1"))
    assert os.path.isdir(os.path.join(root, "work", "task_2_epoch_1"))


def test_four_task_incremental_run(synthetic_coco):
    """4-task 1-class-each split: the task loop generalizes past the
    2-task toy (tril val loads, teacher promotion chain task 2->3->4,
    per-task optimizer rebuilds, num_prev advancing 0/1/2/3)."""
    ann, img_dir, root = synthetic_coco

    from dskd_tpu.train.incremental import run_incremental
    from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                       ExperimentConfig, ModelConfig,
                                       TrainConfig)

    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=4, num_query=16, depth=18,
                          num_encoder_layers=1, num_decoder_layers=1,
                          num_levels=4, dropout=0.0),
        data=DataConfig(train_ann=ann, val_ann=ann,
                        train_img_prefix=img_dir, val_img_prefix=img_dir,
                        catsplit=(1, 1, 1, 1), samples_per_device=1,
                        num_workers=2, max_gt=8, bucket=(64, 64),
                        img_scale=(64, 64)),
        train=TrainConfig(base_lr=1e-4, warmup_iters=2, epochs_per_task=1,
                          step_epochs=(10,), eval_interval=0,
                          ckpt_interval=1, log_interval=1,
                          work_dir=os.path.join(root, "work4"),
                          use_dropout=False),
        distill=DistillFlags(cates_distill="hard + teacher-first",
                             feats_distill="",
                             teacher_score_thr=0.05,
                             teacher_max_per_img=8),
    )
    variables = run_incremental(cfg)
    assert "params" in variables
    for t in range(1, 5):
        assert os.path.isdir(os.path.join(root, "work4",
                                          f"task_{t}_epoch_1")), t

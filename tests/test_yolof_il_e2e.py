"""End-to-end 2-task incremental training for the YOLOF-IL family.

The third e2e family (after the flagship and DETR-IL): task 1 plain YOLOF
-> teacher promotion (including batch_stats snapshot — YOLOF trains its
BNs) -> task 2 with hard merge + soft-KD distill on the 8-device CPU
mesh, checkpointing per task.
"""
import json
import os

import numpy as np
import pytest

from dskd_tpu.data.coco import COCO_CLASSES_ALPHA_ORDER


@pytest.fixture(scope="module")
def synthetic_coco(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("coco_yolof")
    img_dir = root / "images"
    img_dir.mkdir()
    cats = [{"id": cid, "name": n} for n, cid in COCO_CLASSES_ALPHA_ORDER]
    use = [5, 53, 27, 52]
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


def test_two_task_yolof_il_run(synthetic_coco):
    ann, img_dir, root = synthetic_coco

    from dskd_tpu.train.incremental import run_incremental
    from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                       ExperimentConfig, ModelConfig,
                                       TrainConfig)

    cfg = ExperimentConfig(
        model=ModelConfig(arch="yolof", num_classes=4, depth=18),
        data=DataConfig(train_ann=ann, val_ann=ann,
                        train_img_prefix=img_dir, val_img_prefix=img_dir,
                        catsplit=(2, 2), samples_per_device=1,
                        num_workers=2, max_gt=4, bucket=(64, 64),
                        img_scale=(64, 64)),
        train=TrainConfig(base_lr=1e-4, warmup_iters=2, epochs_per_task=1,
                          step_epochs=(10,), eval_interval=1,
                          ckpt_interval=1, log_interval=1,
                          work_dir=os.path.join(root, "work"),
                          use_dropout=False),
        distill=DistillFlags(cates_distill="hard + soft",
                             locat_distill="", feats_distill="",
                             teacher_score_thr=0.05,
                             teacher_max_per_img=4),
    )
    variables = run_incremental(cfg)
    assert "params" in variables
    # BN running stats must exist and have been carried through both tasks
    assert variables.get("batch_stats"), "YOLOF trains its BNs"
    assert os.path.isdir(os.path.join(root, "work", "task_1_epoch_1"))
    assert os.path.isdir(os.path.join(root, "work", "task_2_epoch_1"))

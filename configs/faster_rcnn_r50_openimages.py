"""Faster R-CNN R50 on OpenImages V6 (601 boxable classes).

Parity target: configs/openimages/faster_rcnn_r50_fpn_32x2_1x_
openimages.py (datasets/openimages.py: CSV annotations, class-
description MIDs, label-hierarchy expansion, group-of ignore —
data/openimages.py). Evaluation is the OpenImages protocol
(hierarchy-expanded detections, image-level allowed-class filtering)
via the dataset's own evaluate().
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="faster_rcnn", num_classes=601, depth=50),
        data=DataConfig(dataset_type="openimages",
                        train_ann="data/OpenImages/annotations/"
                                  "oidv6-train-annotations-bbox.csv",
                        val_ann="data/OpenImages/annotations/"
                                "validation-annotations-bbox.csv",
                        cls_desc_file="data/OpenImages/annotations/"
                                      "class-descriptions-boxable.csv",
                        hierarchy_file="data/OpenImages/annotations/"
                                       "bbox_labels_600_hierarchy.json",
                        train_img_prefix="data/OpenImages/train",
                        val_img_prefix="data/OpenImages/validation",
                        catsplit=(601,), samples_per_device=2,
                        img_scale=(1024, 800), bucket=(800, 1024)),
        train=TrainConfig(base_lr=8e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/faster_rcnn_oid"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

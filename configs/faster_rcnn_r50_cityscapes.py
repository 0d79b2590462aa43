"""Faster R-CNN R50 fine-tuned on Cityscapes (8 instance classes).

Parity target: configs/cityscapes/faster_rcnn_r50_fpn_1x_cityscapes.py
(datasets/cityscapes.py; box AP 40.3). Expects COCO-format annotations
(the standard cityscapesscripts conversion); data/cityscapes.py binds
the fixed 8-class vocabulary and per-class AP summary.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="faster_rcnn", num_classes=8, depth=50),
        data=DataConfig(dataset_type="cityscapes",
                        train_ann="data/cityscapes/annotations/"
                                  "instancesonly_filtered_gtFine_train.json",
                        val_ann="data/cityscapes/annotations/"
                                "instancesonly_filtered_gtFine_val.json",
                        train_img_prefix="data/cityscapes/leftImg8bit/train",
                        val_img_prefix="data/cityscapes/leftImg8bit/val",
                        catsplit=(8,), samples_per_device=1,
                        img_scale=(2048, 800), bucket=(1024, 2048)),
        train=TrainConfig(base_lr=1e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=8, step_epochs=(7,),
                          warmup_iters=500,
                          work_dir="work_dirs/faster_rcnn_cityscapes"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

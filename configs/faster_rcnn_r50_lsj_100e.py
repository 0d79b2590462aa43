"""Faster R-CNN R50 with large-scale jitter (strong-baselines recipe).

Parity target: configs/strong_baselines/*lsj* (the LSJ half of
"Rethinking Pre-training and Self-training": Resize img_scale
(1024, 1024) with ratio_range (0.1, 2.0) 'range' mode, RandomCrop to a
fixed 1024x1024 canvas with allow_negative_crop, long 100e schedule) —
data/pipeline.py resize_ratio_range / random_crop. The reference's
strong-baseline configs pair LSJ with Mask R-CNN GN/SyncBN backbones;
the recipe here ships on the box path (the crop transforms are
box-only; mask LSJ is a documented non-goal), with the GN backbone
available via arch='faster_rcnn_gn'.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="faster_rcnn", num_classes=80, depth=50),
        data=DataConfig(catsplit=(80,), samples_per_device=4,
                        img_scale=(1024, 1024), bucket=(1024, 1024),
                        resize_ratio_range=(0.1, 2.0),
                        random_crop=(1024, 1024)),
        train=TrainConfig(base_lr=2e-2, weight_decay=4e-5, grad_clip=35.0,
                          epochs_per_task=100, step_epochs=(88, 96),
                          warmup_iters=500,
                          work_dir="work_dirs/faster_rcnn_lsj"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

"""Cascade R-CNN R50-FPN 1x COCO (multi-stage roi-head zoo baseline).

Parity target: configs/cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py
(3 class-agnostic stages at IoU 0.5/0.6/0.7, stage weights 1/0.5/0.25).
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="cascade_rcnn", num_classes=80, depth=50),
        data=DataConfig(catsplit=(80,), samples_per_device=8,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/cascade_rcnn_r50_1x"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

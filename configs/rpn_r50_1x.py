"""Standalone RPN R50-FPN 1x COCO (proposal network only).

Parity target: configs/rpn/rpn_r50_fpn_1x_coco.py (SGD 0.02, 12 epochs,
class-agnostic objectness; evaluated with the proposal/AR protocol —
AR@1000 58.2 in the reference zoo).
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="rpn", num_classes=1, depth=50),
        data=DataConfig(catsplit=(80,), samples_per_device=8,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=1e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/rpn_r50_1x"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

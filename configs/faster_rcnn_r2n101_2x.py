"""Faster R-CNN with the Res2Net-101 backbone.

Parity target: configs/res2net/faster_rcnn_r2_101_fpn_2x_coco.py (box AP
43.0) — Res2Net bottle2neck scale cascade (models/res2net.py,
backbones/res2net.py), 2x schedule.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="faster_rcnn", num_classes=80,
                          backbone="res2net101"),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=24, step_epochs=(16, 22),
                          warmup_iters=500,
                          work_dir="work_dirs/faster_rcnn_r2n101"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

"""Faster R-CNN with the ResNeSt-50 (split-attention) backbone.

Parity target: configs/resnest/faster_rcnn_s50_fpn_syncbn-backbone+
head_mstrain-range_1x_coco.py (box AP 42.0) — ResNeSt radix-2 split
attention (models/resnest.py, backbones/resnest.py); multi-scale range
training approximated by the multi_scales value list.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="faster_rcnn", num_classes=80,
                          backbone="resnest50"),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        multi_scales=((1333, 640), (1333, 720),
                                      (1333, 800))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/faster_rcnn_s50"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

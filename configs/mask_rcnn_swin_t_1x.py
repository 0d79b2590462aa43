"""Mask R-CNN with the Swin-T backbone.

Parity target: configs/swin/mask_rcnn_swin-t-p4-w7_fpn_1x_coco.py (box
AP 42.7 / mask 39.3) — patch-4 window-7 Swin tiny stages
(models/swin.py, backbones/swin.py) feeding the standard FPN + Mask
R-CNN heads; AdamW recipe (train/optim.py is AdamW throughout).
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="mask_rcnn", num_classes=80,
                          backbone="swin_tiny"),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=1e-4, weight_decay=5e-2, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/mask_rcnn_swin_t"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

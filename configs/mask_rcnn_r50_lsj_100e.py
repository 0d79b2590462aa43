"""Mask R-CNN R50 with large-scale jitter (strong-baselines recipe).

Parity target: configs/strong_baselines/
mask_rcnn_r50_fpn_rpn_2conv_4conv1fc_syncbn_lsj_100e_coco.py family —
the LSJ half ("Rethinking Pre-training and Self-training"): Resize
img_scale (1024, 1024) with ratio_range (0.1, 2.0) 'range' mode +
RandomCrop to the fixed 1024x1024 canvas with allow_negative_crop +
100e schedule. Instance masks follow the crop (data/masks.py
batch_gt_masks crop_offset).
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="mask_rcnn", num_classes=80, depth=50),
        data=DataConfig(catsplit=(80,), samples_per_device=4,
                        img_scale=(1024, 1024), bucket=(1024, 1024),
                        resize_ratio_range=(0.1, 2.0),
                        random_crop=(1024, 1024)),
        train=TrainConfig(base_lr=2e-2, weight_decay=4e-5, grad_clip=35.0,
                          epochs_per_task=100, step_epochs=(88, 96),
                          warmup_iters=500,
                          work_dir="work_dirs/mask_rcnn_lsj"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

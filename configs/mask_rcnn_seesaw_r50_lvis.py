"""Mask R-CNN R50-FPN with SeesawLoss — the LVIS v1 long-tail recipe.

Parity target: configs/seesaw_loss/mask_rcnn_r50_fpn_seesaw_loss_
random_mstrain_2x_lvis_v1.py — SeesawLoss(p=0.8, q=2.0) on the ROI
classifier (C class logits + 2-channel objectness), per-class cumulative
sample counts carried as batch_stats state. Point ``data.*_ann`` at an
LVIS v1 annotation file (``dskd_tpu/data/lvis.py LvisDataset`` evaluates
with the federated protocol); the shipped default uses COCO 80-class
data so the config is runnable out of the box — override
``model.num_classes=1203`` for LVIS v1.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="mask_rcnn_seesaw", num_classes=80,
                          depth=50),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344)),
                        multi_scales=((1333, 640), (1333, 672),
                                      (1333, 704), (1333, 736),
                                      (1333, 768), (1333, 800))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=24, step_epochs=(16, 22),
                          warmup_iters=1000,
                          work_dir="work_dirs/mask_rcnn_seesaw_lvis"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

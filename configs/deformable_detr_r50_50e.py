"""Vanilla Deformable-DETR R50 50e COCO (zoo baseline, 44.5 AP ladder).

Parity target: configs/deformable_detr/deformable_detr_r50_16x2_50e_coco.py
(AdamW 2e-4, 50 epochs, step [40], grad clip 0.1, focal cls + L1 + GIoU).
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="deformable_detr", num_classes=80,
                          num_query=300, depth=50),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=2e-4, weight_decay=1e-4, grad_clip=0.1,
                          epochs_per_task=50, step_epochs=(40,),
                          work_dir="work_dirs/deformable_detr_r50_50e"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

"""Faster R-CNN R50 GN-all trained FROM SCRATCH (no ImageNet init).

Parity target: configs/scratch/faster_rcnn_r50_fpn_gn-all_scratch_6x_
coco.py (box AP 41.2, "Rethinking ImageNet Pre-training") — no frozen
stages, GroupNorm everywhere (the gn-all wiring of models/faster_rcnn.py
norm='gn'), 6x schedule.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="faster_rcnn_gn", num_classes=80, depth=50,
                          frozen_stages=-1),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=73, step_epochs=(65, 71),
                          warmup_iters=500,
                          work_dir="work_dirs/faster_rcnn_scratch"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

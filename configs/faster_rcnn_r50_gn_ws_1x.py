"""Faster R-CNN R50-FPN with GN + Weight Standardization everywhere.

Parity target: configs/gn+ws/faster_rcnn_r50_fpn_gn_ws-all_1x_coco.py —
GroupNorm(32) replacing frozen BN in backbone/neck/head, ConvWS
weight-standardized convs (models/conv_ws.py), and the
Shared4Conv1FCBBoxHead ROI head. The GN-only recipe (configs/gn) is the
same wiring with ws=False (set via FasterRCNN(norm='gn', ws=False)).
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="faster_rcnn_gn_ws", num_classes=80,
                          depth=50),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/faster_rcnn_gn_ws"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

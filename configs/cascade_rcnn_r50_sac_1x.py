"""Cascade R-CNN R50 with SAC only (DetectoRS ablation).

Parity target: configs/detectors/cascade_rcnn_r50_sac_1x_coco.py
(box AP 45.0): switchable atrous convolution replaces the bottleneck
3x3 on backbone stages 2-4 (same kernel run at dilation 1 and 3 with a
zero-init weight delta, blended per pixel by a learned switch, global
pre/post context convs) — dskd_tpu/models/detectors_rs.py SAConv.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="detectors_cascade_rcnn", num_classes=80,
                          depth=50, rfp=False, sac=True),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/cascade_rcnn_sac"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

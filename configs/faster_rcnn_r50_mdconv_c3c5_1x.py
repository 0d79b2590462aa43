"""Faster R-CNN R50 with modulated deformable conv at stages C3-C5.

Parity target: configs/dcnv2/faster_rcnn_r50_fpn_mdconv_c3-c5_1x_coco.py
(box AP 41.4; the configs/dcn dconv variant is the same wiring with
``DeformConv2d(modulated=False)`` — ops/deform_conv.py supports both).
The backbone's conv2 in every bottleneck of stages 2-4 becomes a DCNv2
(dskd_tpu/models/resnet.py dcn_stages).
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="faster_rcnn", num_classes=80, depth=50,
                          dcn_stages=(False, True, True, True)),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/faster_rcnn_mdconv"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

"""Faster R-CNN with the HRNetV2p-W18 backbone + HRFPN neck.

Parity target: configs/hrnet/faster_rcnn_hrnetv2p_w18_2x_coco.py (box AP
38.9) — multi-resolution HRNet branches concatenated and pooled by HRFPN
(models/hrnet.py, backbones/hrnet.py, necks/hrfpn.py).
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="faster_rcnn", num_classes=80,
                          backbone="hrnet_w18"),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=24, step_epochs=(16, 22),
                          warmup_iters=500,
                          work_dir="work_dirs/faster_rcnn_hrnet_w18"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

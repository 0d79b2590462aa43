"""FCOS + HRNetV2p-W18 + HRFPN 1x COCO.

Parity target: configs/hrnet/fcos_hrnetv2p_w18_gn-head_4x4_1x_coco.py
(multi-resolution backbone, HRFPN concat-reduce neck).
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="fcos", num_classes=80,
                          backbone="hrnet_w18"),
        data=DataConfig(catsplit=(80,), samples_per_device=4,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=1e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/fcos_hrnetv2p_w18"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

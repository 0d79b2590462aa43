"""RetinaNet + EfficientNet-B3 FPN COCO.

Parity target: configs/efficientnet/retinanet_effb3_fpn_crop896_8x4_1x_coco
(stride-8/16/32 taps at channels 48/136/384, FPN from level 0).
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="retinanet", num_classes=80,
                          backbone="effb3"),
        data=DataConfig(catsplit=(80,), samples_per_device=4,
                        img_scale=(896, 896), bucket=(896, 896)),
        train=TrainConfig(base_lr=4e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=1000,
                          work_dir="work_dirs/retinanet_effb3"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

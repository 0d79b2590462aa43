"""CenterNet ResNet-18 (heatmap zoo baseline).

Parity target: configs/centernet/centernet_resnet18_140e_coco.py
(SGD 0.02 eff., 140 epochs, steps [90, 120], gaussian focal + wh/offset
L1, NMS-free decode).
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="centernet", num_classes=80, depth=18,
                          frozen_stages=-1),
        data=DataConfig(catsplit=(80,), samples_per_device=16,
                        img_scale=(512, 512), bucket=(512, 512)),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=140, step_epochs=(90, 120),
                          warmup_iters=1000,
                          work_dir="work_dirs/centernet_r18"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

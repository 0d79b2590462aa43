"""YOLOv3 Darknet-53 COCO (classic one-stage zoo baseline).

Parity target: configs/yolo/yolov3_d53_mstrain-608_273e_coco.py
(Darknet-53, 3-scale neck, responsible-anchor BCE losses).
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="yolov3", num_classes=80),
        data=DataConfig(catsplit=(80,), samples_per_device=8,
                        img_scale=(608, 608), bucket=(608, 608)),
        train=TrainConfig(base_lr=1e-3, weight_decay=5e-4, grad_clip=35.0,
                          epochs_per_task=273, step_epochs=(218, 246),
                          warmup_iters=2000,
                          work_dir="work_dirs/yolov3_d53"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

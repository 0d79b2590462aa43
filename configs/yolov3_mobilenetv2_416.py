"""YOLOv3 on MobileNetV2 (the lightweight yolo zoo recipe).

Parity target: configs/yolo/yolov3_mobilenetv2_mstrain-416_300e_coco.py —
MobileNetV2 backbone tapped at out_indices (2, 4, 6) with LeakyReLU(0.1)
activations and trainable BN, the 96-channel YOLOV3Neck/head, the
standard YOLO anchor table, multi-scale (320..416) training, SGD 3e-3
with 30-epoch steps inside the 300e (here: 24e smoke-scale) schedule.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="yolov3", num_classes=80,
                          backbone="mobilenet_v2"),
        data=DataConfig(catsplit=(80,), samples_per_device=8,
                        img_scale=(416, 416), bucket=(416, 416),
                        multi_scales=((320, 320), (352, 352), (384, 384),
                                      (416, 416)),
                        photo_metric_distortion=True,
                        expand=True, min_iou_crop=True),
        train=TrainConfig(base_lr=3e-3, weight_decay=5e-4, grad_clip=35.0,
                          epochs_per_task=24, step_epochs=(16, 22),
                          warmup_iters=2000,
                          work_dir="work_dirs/yolov3_mbv2"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

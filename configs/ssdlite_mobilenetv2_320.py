"""SSDLite-MobileNetV2 (the mobile single-shot zoo recipe, from scratch).

Parity target: configs/ssd/ssdlite_mobilenetv2_scratch_600e_coco.py —
MobileNetV2 tapped at (4, 7), depthwise-separable SSDNeck extras
(out 512/256/256/128) and SSD-Lite head (per-branch depthwise 3x3 + 1x1
preds), the explicit 6-level anchor table (strides 16..320, min_sizes
48..304), trainable BN everywhere (no pretrain, no norm_eval), SGD
cosine 600e (here: 24e smoke-scale) at 320x320.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="ssd", num_classes=80, ssd_input_size=320,
                          frozen_stages=-1),
        data=DataConfig(catsplit=(80,), samples_per_device=8,
                        img_scale=(320, 320), bucket=(320, 320),
                        photo_metric_distortion=True,
                        expand=True, min_iou_crop=True),
        train=TrainConfig(base_lr=1.5e-2, weight_decay=4e-5,
                          grad_clip=35.0,
                          epochs_per_task=24, step_epochs=(16, 22),
                          warmup_iters=500,
                          work_dir="work_dirs/ssdlite_mbv2"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

"""SSD512 COCO (the larger single-shot zoo baseline).

Parity target: configs/ssd/ssd512_coco.py — the SSD300 recipe at a
512x512 canvas with the 7-level VGG-extras ladder (ssd_neck.py
out_channels (512, 1024, 512, 256, 256, 256, 256), last_kernel_size=4)
and the SSDAnchorGenerator basesize_ratio_range (0.1, 0.9) ladder with
the 4%/10% level-0 insert (anchor_generator.py:536-541). The reference
train pipeline runs Expand -> MinIoURandomCrop -> Resize -> Flip ->
PhotoMetricDistortion (configs/ssd/ssd300_coco.py:13-29); this repo's
pipeline applies PhotoMetricDistortion BEFORE the geometric augs (a
known ordering difference — photometric jitter commutes with geometry
in distribution, documented here per the round-3 advisor). Same
24-epoch SGD 2e-3 schedule.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="ssd", num_classes=80, ssd_input_size=512),
        data=DataConfig(catsplit=(80,), samples_per_device=8,
                        img_scale=(512, 512), bucket=(512, 512),
                        photo_metric_distortion=True,
                        expand=True, min_iou_crop=True),
        train=TrainConfig(base_lr=2e-3, weight_decay=5e-4, grad_clip=35.0,
                          epochs_per_task=24, step_epochs=(16, 22),
                          warmup_iters=500,
                          work_dir="work_dirs/ssd512"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

"""SSD300 COCO (classic single-shot zoo baseline).

Parity target: configs/ssd/ssd300_coco.py (VGG-16 + L2Norm + extras,
3:1 hard negative mining, smooth-L1, 24 epochs SGD 2e-3) including its
train pipeline's geometric recipe: PhotoMetricDistortion -> Expand
(mean-fill, ratio 1-4, p=0.5) -> MinIoURandomCrop -> Resize -> Flip
(data/pipeline.py expand_image / min_iou_random_crop).
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="ssd", num_classes=80),
        data=DataConfig(catsplit=(80,), samples_per_device=8,
                        img_scale=(300, 300), bucket=(300, 300),
                        photo_metric_distortion=True,
                        expand=True, min_iou_crop=True),
        train=TrainConfig(base_lr=2e-3, weight_decay=5e-4, grad_clip=35.0,
                          epochs_per_task=24, step_epochs=(16, 22),
                          warmup_iters=500,
                          work_dir="work_dirs/ssd300"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

"""YOLOX-s COCO 300e (non-incremental zoo baseline).

Parity target: configs/yolox/yolox_s_8x8_300e_coco.py (CSPDarknet
deepen 0.33 / widen 0.5, SimOTA, IoU(mode='square') box loss, SGD 0.01
with quadratic warmup + quarter cosine to min_lr_ratio 0.05, Mosaic +
MixUp with the last 15 epochs no-aug + L1 — box AP 40.5 in the zoo).
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="yolox", num_classes=80),
        data=DataConfig(catsplit=(80,), samples_per_device=8,
                        img_scale=(640, 640), bucket=(640, 640),
                        mosaic=True, mixup=True),
        train=TrainConfig(base_lr=1e-2, weight_decay=5e-4, grad_clip=35.0,
                          epochs_per_task=300, lr_policy="yolox_cosine",
                          min_lr_ratio=0.05, warmup_iters=5000,
                          no_aug_epochs=15, use_ema=True,
                          work_dir="work_dirs/yolox_s_300e"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

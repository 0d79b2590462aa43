"""YOLACT R50 1x COCO (parity: configs/yolact/yolact_r50_1x8_coco.py —
prototype-mask instance segmentation, 550x550 fixed scale, OHEM cls,
cropped prototype BCE 6.125, aux semantic head; mask AP 29.0)."""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="yolact", num_classes=80, depth=50,
                          frozen_stages=-1),
        data=DataConfig(catsplit=(80,), samples_per_device=8,
                        img_scale=(550, 550), bucket=(550, 550)),
        train=TrainConfig(base_lr=1e-3, weight_decay=5e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 10, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/yolact_r50"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

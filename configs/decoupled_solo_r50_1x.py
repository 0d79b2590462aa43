"""Decoupled SOLO R50-FPN 1x COCO (parity:
configs/solo/decoupled_solo_r50_fpn_1x_coco.py — separate x/y mask
branches, cell mask = sigmoid(y_i)*sigmoid(x_j); mask AP 33.9)."""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="decoupled_solo", num_classes=80, depth=50),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=1e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/decoupled_solo_r50"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

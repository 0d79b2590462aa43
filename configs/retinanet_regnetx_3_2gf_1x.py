"""RetinaNet + RegNetX-3.2GF FPN 1x COCO.

Parity target: configs/regnet/retinanet_regnetx-3.2GF_fpn_1x_coco.py
(design-space backbone, stage widths 96/192/432/1008, group width 48).
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="retinanet", num_classes=80,
                          backbone="regnetx_3.2gf"),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=1e-2, weight_decay=5e-5, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/retinanet_regnetx_3_2gf"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

"""RetinaNet with the PVT-Tiny backbone.

Parity target: configs/pvt/retinanet_pvt-t_fpn_1x_coco.py (box AP 36.6)
— Pyramid Vision Transformer tiny stages (models/pvt.py,
backbones/pvt.py) under the standard RetinaNet FPN + head; AdamW recipe.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="retinanet", num_classes=80,
                          backbone="pvt_tiny"),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=1e-4, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/retinanet_pvt_t"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

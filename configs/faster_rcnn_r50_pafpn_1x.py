"""Faster R-CNN R50 with the PAFPN neck (bottom-up path augmentation).

Parity target: configs/pafpn/faster_rcnn_r50_pafpn_1x_coco.py (box AP
37.5) — the FPN top-down pass followed by PAFPN's extra bottom-up path
(models/pafpn.py, necks/pafpn.py).
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="faster_rcnn_pafpn", num_classes=80,
                          depth=50),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/faster_rcnn_pafpn"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

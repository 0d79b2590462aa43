"""Faster R-CNN R50 with the ResNet-strikes-back pretrain recipe.

Parity target: configs/resnet_strikes_back/faster_rcnn_r50_fpn_rsb-
pretrain_1x_coco.py (box AP 40.8) — rsb A1 ImageNet weights loaded via
``model.backbone_ckpt`` (utils/torch_weights.py accepts any
torchvision-shaped ResNet state_dict, which the rsb/mocov2/swav
checkpoints — configs/selfsup_pretrain — all are) + the AdamW
low-lr/high-wd fine-tune schedule.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="faster_rcnn", num_classes=80, depth=50,
                          backbone_ckpt=None),   # set to the rsb .pth
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=2e-4, weight_decay=5e-2, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/faster_rcnn_rsb"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

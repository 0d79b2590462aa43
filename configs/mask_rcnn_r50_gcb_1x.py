"""Mask R-CNN R50-FPN with GCNet context blocks (r4, c3-c5).

Parity target: configs/gcnet/mask_rcnn_r50_fpn_r4_gcb_c3-c5_1x_coco.py —
ContextBlock(ratio=1/4) plugged after conv3 of every bottleneck in
stages 2-4 (models/plugins.py ContextBlock; zero-init fusion keeps the
pretrained backbone behavior at step 0).
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="mask_rcnn", num_classes=80, depth=50,
                          gcb_stages=(False, True, True, True),
                          gcb_ratio=0.25),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/mask_rcnn_r50_gcb"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

"""Fast R-CNN R50-FPN — the no-RPN two-stage variant on external
proposals.

Parity target: configs/fast_rcnn/fast_rcnn_r50_fpn_1x_coco.py
(detectors/fast_rcnn.py: proposals are read from precomputed files;
train/family.py's fast_rcnn branch documents the jittered-GT stand-in
used where no proposal files exist).
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="fast_rcnn", num_classes=80, depth=50),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/fast_rcnn"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

"""Sparse R-CNN R50-FPN 1x COCO (parity: configs/sparse_rcnn/
sparse_rcnn_r50_fpn_1x_coco.py, box AP 37.9: 100 learned proposals, 6
dynamic instance interactive refinement stages, NMS-free)."""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="sparse_rcnn", num_classes=80, depth=50),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=2.5e-5, weight_decay=1e-4,
                          grad_clip=1.0, epochs_per_task=12,
                          step_epochs=(8, 11), warmup_iters=1000,
                          work_dir="work_dirs/sparse_rcnn_r50"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

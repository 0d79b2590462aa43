"""Faster R-CNN R50 with the GRoIE generic ROI extractor.

Parity target: configs/groie/faster_rcnn_r50_fpn_groie_1x_coco.py
(box AP 38.3): the bbox ROI extractor RoIAligns EVERY FPN level for
every proposal, runs a shared pre ConvModule(5x5)+ReLU per level, sums
the levels, and refines the aggregate with a GeneralizedAttention
post-module ('0100', 6 heads, kv_stride 2) — mmdet roi_heads/
roi_extractors/generic_roi_extractor.py:46-86 semantics via
dskd_tpu/models/faster_rcnn.py GRoIE + ops/roi_align.py
all_level_roi_align.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="faster_rcnn", num_classes=80, depth=50,
                          groie=True),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/faster_rcnn_groie"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

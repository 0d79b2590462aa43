"""DetectoRS (full recipe) on Cascade R-CNN R50.

Parity target: configs/detectors/detectors_cascade_rcnn_r50_1x_coco.py
(box AP 47.4): recursive feature pyramid (two DetectoRS backbone passes
with ASPP feedback into the first block of stages 2-4, shared FPN,
zero-init sigmoid fusion) + switchable atrous convolution on every
bottleneck 3x3 of stages 2-4 — dskd_tpu/models/detectors_rs.py wired via
``ModelConfig.rfp``/``sac``. The single-mechanism ablations
cascade_rcnn_r50_rfp_1x / cascade_rcnn_r50_sac_1x (AP 44.8 / 45.0) ship
alongside.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="detectors_cascade_rcnn", num_classes=80,
                          depth=50, rfp=True, sac=True),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/detectors_cascade_rcnn"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

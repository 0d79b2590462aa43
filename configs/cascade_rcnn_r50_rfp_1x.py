"""Cascade R-CNN R50 with RFP only (DetectoRS ablation).

Parity target: configs/detectors/cascade_rcnn_r50_rfp_1x_coco.py
(box AP 44.8): the recursive feature pyramid without SAC — two plain
DetectoRS backbone passes (ASPP-transformed pyramid fed back as
zero-init residuals into stages 2-4), shared FPN weights, zero-init
sigmoid-gated fusion of the two pyramids — dskd_tpu/models/
detectors_rs.py RFP with sac_stages all-False.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="detectors_cascade_rcnn", num_classes=80,
                          depth=50, rfp=True, sac=False),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/cascade_rcnn_rfp"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

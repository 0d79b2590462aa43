"""GA-RPN R50-FPN 1x COCO (parity: configs/guided_anchoring/
ga_rpn_r50_caffe_fpn_1x_coco.py — guided-anchoring proposal network,
AR1000 68.4; proposal AR protocol)."""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="ga_rpn", num_classes=1, depth=50),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/ga_rpn_r50"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

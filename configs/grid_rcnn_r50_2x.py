"""Grid R-CNN R50-FPN 2x COCO (parity: configs/grid_rcnn/
grid_rcnn_r50_fpn_gn-head_2x_coco.py, box AP 40.4: classification-only
ROI head + fused 9-point grid localization)."""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="grid_rcnn", num_classes=80, depth=50),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=24, step_epochs=(17, 23),
                          warmup_iters=3665,
                          work_dir="work_dirs/grid_rcnn_r50"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

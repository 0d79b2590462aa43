"""PointRend R50-FPN 1x COCO (parity: configs/point_rend/
point_rend_r50_caffe_fpn_mstrain_1x_coco.py — coarse 7x7 mask head +
uncertainty-point refinement, box AP 38.4 / mask AP 36.3)."""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="point_rend", num_classes=80, depth=50),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344)),
                        multi_scales=((1333, 640), (1333, 672), (1333, 704),
                                      (1333, 736), (1333, 768), (1333, 800))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/point_rend_r50"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

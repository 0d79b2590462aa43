"""RetinaNet R50-FPG crop640 50e COCO (parity: configs/fpg/
retinanet_r50_fpg_crop640_50e_coco.py — 9-stack feature pyramid grids
neck, box AP 40.5)."""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="retinanet_fpg", num_classes=80, depth=50),
        data=DataConfig(catsplit=(80,), samples_per_device=8,
                        img_scale=(640, 640), bucket=(640, 640)),
        train=TrainConfig(base_lr=1e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=50, step_epochs=(30, 40),
                          warmup_iters=1000,
                          work_dir="work_dirs/retinanet_fpg"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

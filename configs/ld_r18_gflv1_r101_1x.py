"""LD: GFL r18 student distilled from a GFL teacher (parity: configs/ld/
ld_r18_gflv1_r101_fpn_coco_1x.py — localization distillation of corner
distributions, KLDiv T=10 weight 0.25). The teacher checkpoint loads
through the driver's teacher protocol."""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="ld", num_classes=80, depth=18,
                          reg_max=16, teacher_depth=101),
        data=DataConfig(catsplit=(80,), samples_per_device=4,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=1e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/ld_r18"),
        distill=DistillFlags(cates_distill="hard", feats_distill=""),
    )

"""LAD: label assignment distillation, PAA r50 student assigned by a
frozen teacher (parity: configs/lad/lad_r50_paa_r101_fpn_coco_1x.py, box
AP 41.4 — the teacher's GMM assignment supervises the student)."""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="lad", num_classes=80, depth=50,
                          teacher_depth=101),
        data=DataConfig(catsplit=(80,), samples_per_device=4,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=1e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/lad_r50"),
        distill=DistillFlags(cates_distill="hard", feats_distill=""),
    )

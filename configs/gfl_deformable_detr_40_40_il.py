"""The flagship DSKD recipe: GFL-Deformable-DETR R50, COCO 40+40 incremental.

Parity target: configs/deformable_detr/chaosuan_gfl_deformable_detr_40_r50_
8x4_1x_qoqo_il.py — cates_distill='hard + teacher-first',
feats_distill='corr + fg_info + decode_v1', AdamW 12 epochs/task,
steps [8, 11], warmup 1500 iters, grad clip 0.1, teacher score_thr 0.3.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(num_classes=80, depth=50),
        data=DataConfig(catsplit=(40, 40), samples_per_device=8,
                        aspect_buckets=((640, 480), (480, 640)),
                        gt_buckets=(8, 16, 32, 64, 100)),
        train=TrainConfig(base_lr=2e-4, epochs_per_task=12,
                          step_epochs=(8, 11),
                          work_dir="work_dirs/gfl_ddetr_40_40_il"),
        distill=DistillFlags(
            cates_distill="hard + teacher-first",
            locat_distill="",
            memory_distill="",
            feats_distill="corr + fg_info + decode_v1",
            teacher_score_thr=0.3, teacher_max_per_img=100),
    )

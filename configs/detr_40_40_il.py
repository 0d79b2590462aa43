"""DETR-IL COCO 40+40 incremental recipe.

Parity target: detectors/detr_il.py (the fork's vanilla-DETR teacher
protocol — out_teacher keep-ids, hard merge, soft-KD gated by
'soft' in cates_distill, detr_il.py:291-305) with the stock DETR R50
schedule (configs/detr/detr_r50_8x2_150e_coco.py: AdamW 1e-4).
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="detr", num_classes=80, num_query=100,
                          depth=50, num_encoder_layers=6,
                          num_decoder_layers=6),
        data=DataConfig(catsplit=(40, 40), samples_per_device=8),
        train=TrainConfig(base_lr=1e-4, weight_decay=1e-4, grad_clip=0.1,
                          epochs_per_task=12, step_epochs=(8, 11),
                          work_dir="work_dirs/detr_40_40_il"),
        distill=DistillFlags(cates_distill="hard + soft",
                             locat_distill="",
                             feats_distill="kldv",
                             teacher_score_thr=0.3,
                             teacher_max_per_img=100),
    )

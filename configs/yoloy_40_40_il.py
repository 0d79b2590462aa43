"""YOLOY (YOLOX-style) COCO 40+40 incremental recipe.

Parity target: configs/yoloy/yoloy_resnet_qoqo_il.py (SGD lr 0.02, 12
epochs/task, catwise task split) and yoloy_resnet_wrxt_il.py's distill
flags (cates_distill='hard+soft', feats_distill='kldv') — the detector-level
hard merge + head soft/kldv protocol of detectors/yoloy.py:147-171.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="yoloy", num_classes=80, depth=18),
        data=DataConfig(catsplit=(40, 40), samples_per_device=8),
        train=TrainConfig(base_lr=1e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/yoloy_40_40_il"),
        distill=DistillFlags(cates_distill="hard + soft",
                             locat_distill="",
                             feats_distill="kldv",
                             teacher_score_thr=0.3,
                             teacher_max_per_img=100),
    )

"""YOLOF R50-C5 incremental 40+40 (parity: configs/yolof/*il*.py)."""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="yolof", num_classes=80, depth=50),
        data=DataConfig(catsplit=(40, 40), samples_per_device=8),
        train=TrainConfig(base_lr=0.12 / 64 * 8,  # SGD-equivalent scaled
                          epochs_per_task=12, step_epochs=(8, 11),
                          work_dir="work_dirs/yolof_40_40_il"),
        distill=DistillFlags(cates_distill="hard + soft",
                             locat_distill="bbox",
                             feats_distill="kldv",
                             teacher_score_thr=0.3,
                             teacher_max_per_img=100),
    )

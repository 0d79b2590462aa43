"""PISA SSD300 COCO (parity: configs/pisa/pisa_ssd300_coco.py —
ISR-P + CARL on the SSD head, box AP 27.6 / +2.1 over SSD300)."""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="pisa_ssd", num_classes=80),
        data=DataConfig(catsplit=(80,), samples_per_device=8,
                        img_scale=(300, 300), bucket=(300, 300),
                        photo_metric_distortion=True),
        train=TrainConfig(base_lr=2e-3, weight_decay=5e-4, grad_clip=35.0,
                          epochs_per_task=24, step_epochs=(16, 22),
                          warmup_iters=500,
                          work_dir="work_dirs/pisa_ssd300"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

"""RetinaNet R50-NASFPN crop640 50e COCO (parity: configs/nas_fpn/
retinanet_r50_nasfpn_crop640_50e_coco.py — searched merge DAG neck +
RetinaSepBNHead, box AP 40.5)."""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="retinanet_nasfpn", num_classes=80,
                          depth=50),
        data=DataConfig(catsplit=(80,), samples_per_device=8,
                        img_scale=(640, 640), bucket=(640, 640)),
        train=TrainConfig(base_lr=8e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=50, step_epochs=(30, 40),
                          warmup_iters=1000,
                          work_dir="work_dirs/retinanet_nasfpn"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

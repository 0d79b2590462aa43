"""Mask2Former R50 50e COCO (parity: configs/mask2former/
mask2former_r50_lsj_8x2_50e_coco.py — masked-attention mask
classification over a deformable pixel decoder, instance mask AP 44.8;
this config drives the instance (things) protocol)."""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="mask2former", num_classes=80, depth=50,
                          num_query=100),
        data=DataConfig(catsplit=(80,), samples_per_device=1,
                        img_scale=(1024, 1024), bucket=(1024, 1024),
                        gt_buckets=(8, 16, 32, 64)),
        train=TrainConfig(base_lr=1e-4, weight_decay=5e-2, grad_clip=0.01,
                          epochs_per_task=50, step_epochs=(44, 48),
                          warmup_iters=10,
                          work_dir="work_dirs/mask2former_r50"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

"""MaskFormer R50 75e COCO (parity: configs/maskformer/
maskformer_r50_mstrain_16x1_75e_coco.py — mask classification with a
transformer-encoder pixel decoder, PQ 46.9; this config drives the
instance (things) protocol on the box/mask data path)."""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="maskformer", num_classes=80, depth=50,
                          num_query=100),
        data=DataConfig(catsplit=(80,), samples_per_device=1,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344)),
                        gt_buckets=(8, 16, 32, 64)),
        train=TrainConfig(base_lr=1e-4, weight_decay=1e-4, grad_clip=0.01,
                          epochs_per_task=75, step_epochs=(58,),
                          warmup_iters=500,
                          work_dir="work_dirs/maskformer_r50"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

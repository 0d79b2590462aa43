"""QueryInst R50-FPN 1x COCO (parity: configs/queryinst/
queryinst_r50_fpn_1x_coco.py — Sparse R-CNN + per-stage dynamic mask
heads, box AP 42.0 / mask AP 37.5)."""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="queryinst", num_classes=80, depth=50,
                          num_query=100),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344)),
                        gt_buckets=(8, 16, 32, 64)),
        train=TrainConfig(base_lr=2.5e-5, weight_decay=1e-4,
                          grad_clip=0.1, epochs_per_task=12,
                          step_epochs=(8, 11), warmup_iters=1000,
                          work_dir="work_dirs/queryinst_r50"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

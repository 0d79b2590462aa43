"""Decoupled SOLO-Light R50-FPN 3x COCO (parity:
configs/solo/decoupled_solo_light_r50_fpn_3x_coco.py — one shared 4-conv
mask tower split at the final per-level x/y convs, tighter scale ranges
(1,64)...(256,2048); the light recipe trains at long side 852 with
multi-scale SHORT sides 352..512 (the reference's img_scale ladder
[(852,512)..(852,352)]) and tests at (852,512); mask AP 32.9)."""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="decoupled_solo_light", num_classes=80,
                          depth=50),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(852, 512), bucket=(512, 864),
                        aspect_buckets=((864, 512), (512, 864)),
                        multi_scales=((852, 512), (852, 480), (852, 448),
                                      (852, 416), (852, 384), (852, 352))),
        train=TrainConfig(base_lr=1e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=36, step_epochs=(27, 33),
                          warmup_iters=500,
                          work_dir="work_dirs/decoupled_solo_light_r50"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

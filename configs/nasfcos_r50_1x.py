"""NAS-FCOS R50 1x COCO (parity: configs/nas_fcos/
nas_fcos_nashead_r50_caffe_fpn_gn-head_4x4_1x_coco.py, AP 39.4: the
searched FPN cell DAG; standard FCOS head — the searched deformable head
tower is documented as simplified)."""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="nasfcos", num_classes=80, depth=50),
        data=DataConfig(catsplit=(80,), samples_per_device=4,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=1e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/nasfcos_r50"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

"""TridentNet R50-C4 1x COCO (parity: configs/tridentnet/
tridentnet_r50_caffe_1x_coco.py, box AP 37.6: 3 weight-shared dilated
conv4 branches at train, single-branch C4 deployment)."""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    cfg = ExperimentConfig(
        model=ModelConfig(arch="tridentnet", num_classes=80, depth=50),
        data=DataConfig(catsplit=(80,), samples_per_device=1,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/tridentnet_r50"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )
    cfg.rcnn_num_proposals = 500
    cfg.rcnn_num_samples = 128
    return cfg

"""GHM RetinaNet R50-FPN 1x COCO (gradient harmonizing mechanism).

Parity target: configs/ghm/retinanet_ghm_r50_fpn_1x_coco.py — RetinaNet
with GHMC(bins=30, momentum=0.75) classification + GHMR(mu=0.02,
bins=10, momentum=0.7, loss_weight=10) regression, grad_clip 35.
The GHM EMA bin counts are batch_stats state on the model
(models/retinanet.py) threaded through the train step.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="retinanet_ghm", num_classes=80, depth=50),
        data=DataConfig(catsplit=(80,), samples_per_device=8,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=1e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/retinanet_ghm_r50_1x"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

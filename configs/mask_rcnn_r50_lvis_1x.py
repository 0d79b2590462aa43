"""Mask R-CNN R50 on LVIS v1 (native binding, 1203 classes).

Parity target: configs/lvis/mask_rcnn_r50_fpn_sample1e-3_mstrain_1x_
lvis_v1.py (datasets/lvis.py; box AP 22.5 / mask 21.7).
``dataset_type='lvis'`` binds data/lvis.py: federated-annotation
evaluation (positives + declared negatives per image), APr/APc/APf
splits, score_thr=0 with 300 dets/img per the LVIS protocol. The
reference's oversample_thr=1e-3 repeat-factor sampling maps to
data/wrappers.py ClassBalancedDataset.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="mask_rcnn", num_classes=1203, depth=50),
        data=DataConfig(dataset_type="lvis",
                        train_ann="data/lvis_v1/annotations/"
                                  "lvis_v1_train.json",
                        val_ann="data/lvis_v1/annotations/"
                                "lvis_v1_val.json",
                        train_img_prefix="data/lvis_v1",
                        val_img_prefix="data/lvis_v1",
                        catsplit=(1203,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        multi_scales=((1333, 640), (1333, 672),
                                      (1333, 704), (1333, 736),
                                      (1333, 768), (1333, 800))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=1000,
                          work_dir="work_dirs/mask_rcnn_lvis"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
        test_max_per_img=300,
    )

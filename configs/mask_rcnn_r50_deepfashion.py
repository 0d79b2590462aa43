"""Mask R-CNN R50 on DeepFashion (15 clothing classes).

Parity target: configs/deepfashion/mask_rcnn_r50_fpn_15e_deepfashion.py
+ datasets/deepfashion.py (a CocoDataset subclass that only swaps the
CLASSES tuple) — here the same binding rides ``DataConfig.classes``
over the COCO-format json loader.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)

from dskd_tpu.data.deepfashion import DEEPFASHION_CLASSES


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="mask_rcnn", num_classes=15, depth=50),
        data=DataConfig(dataset_type="coco",
                        classes=DEEPFASHION_CLASSES,
                        train_ann="data/DeepFashion/annotations/"
                                  "DeepFashion_segmentation_train.json",
                        val_ann="data/DeepFashion/annotations/"
                                "DeepFashion_segmentation_query.json",
                        train_img_prefix="data/DeepFashion/Img",
                        val_img_prefix="data/DeepFashion/Img",
                        catsplit=(15,), samples_per_device=2,
                        img_scale=(750, 1101), bucket=(768, 1152)),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=15, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/mask_rcnn_deepfashion"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

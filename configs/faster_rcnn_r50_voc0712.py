"""Faster R-CNN R50 on PASCAL VOC (native XML devkit binding).

Parity target: configs/pascal_voc/faster_rcnn_r50_fpn_1x_voc0712.py
(VOC mAP 80.3; datasets/voc.py + xml_style.py). ``dataset_type='voc'``
binds data/voc.py directly (no offline conversion); evaluation runs the
devkit's own protocol (11-point for year 2007) via
eval/evaluator.py:evaluate_dataset_native. The reference concatenates
07+12 trainval — point data_root at one devkit year, or pre-concat with
data/wrappers.py ConcatDataset.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="faster_rcnn", num_classes=20, depth=50),
        data=DataConfig(dataset_type="voc", data_root="data/VOCdevkit",
                        train_split="trainval", val_split="test",
                        voc_year="2007",
                        catsplit=(20,), samples_per_device=2,
                        img_scale=(1000, 600), bucket=(608, 1024),
                        aspect_buckets=((1024, 608), (608, 1024))),
        train=TrainConfig(base_lr=1e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=4, step_epochs=(3,),
                          warmup_iters=500,
                          work_dir="work_dirs/faster_rcnn_voc"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

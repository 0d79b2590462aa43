"""SSD300 face detector on WIDER FACE (native binding).

Parity target: configs/wider_face/ssd300_wider_face.py
(datasets/wider_face.py: VOC-XML layout with folder-tag image paths —
data/voc.py WIDERFaceDataset). Single 'face' class; mAP@0.5 via the
dataset's own evaluate().
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="ssd", num_classes=1),
        data=DataConfig(dataset_type="wider_face",
                        data_root="data/WIDERFace",
                        train_split="train", val_split="val",
                        catsplit=(1,), samples_per_device=8,
                        img_scale=(300, 300), bucket=(300, 300),
                        photo_metric_distortion=True),
        train=TrainConfig(base_lr=1.2e-2, weight_decay=5e-4,
                          grad_clip=35.0, epochs_per_task=24,
                          step_epochs=(16, 20), warmup_iters=1000,
                          work_dir="work_dirs/ssd300_wider"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

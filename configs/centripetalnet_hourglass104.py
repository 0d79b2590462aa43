"""CentripetalNet Hourglass-104 COCO (parity: configs/centripetalnet/
centripetalnet_hourglass104_mstest_16x6_210e_coco.py, box AP 44.9:
guiding-shift feature adaption + centripetal pair matching)."""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="centripetalnet", num_classes=80),
        data=DataConfig(catsplit=(80,), samples_per_device=3,
                        img_scale=(511, 511), bucket=(512, 512)),
        train=TrainConfig(base_lr=5e-4, weight_decay=0.0, grad_clip=35.0,
                          epochs_per_task=210, step_epochs=(190,),
                          warmup_iters=500,
                          work_dir="work_dirs/centripetalnet_hg104"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

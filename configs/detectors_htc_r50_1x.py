"""DetectoRS (full recipe) on HTC R50 — the DetectoRS headline config.

Parity target: configs/detectors/detectors_htc_r50_1x_coco.py (box AP
49.1, mask AP 42.6): Hybrid Task Cascade (interleaved bbox/mask stages,
mask information flow, fused semantic branch) over the recursive feature
pyramid with switchable atrous convolution — the rfp/sac knobs HTC
inherits from the Cascade R-CNN base (models/htc.py + detectors_rs.py).
The single-mechanism htc_r50_rfp_1x / htc_r50_sac_1x ablations (AP
46.6 / 46.4) are the same config with one knob off.
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="htc", num_classes=80, depth=50,
                          rfp=True, sac=True),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344)),
                        seg_prefix="data/coco/stuffthingmaps/train2017"),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/detectors_htc"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

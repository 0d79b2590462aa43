"""Faster R-CNN R50 with GeneralizedAttention (empirical attention).

Parity target: configs/empirical_attention/
faster_rcnn_r50_fpn_attention_1111_1x_coco.py (box AP 42.1): the
spatial-attention block of "An Empirical Study of Spatial Attention
Mechanisms in Deep Networks" inserted after conv2 of every bottleneck
in backbone stages 3-4 (attention_type '1111' = all four energy terms,
8 heads, kv_stride 2 — dskd_tpu/models/plugins.py GeneralizedAttention).
The '0010' saliency-only variant is the same config with
``gen_attn_type="0010"`` (AP 40.0).
"""
from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                   ExperimentConfig, ModelConfig,
                                   TrainConfig)


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        model=ModelConfig(arch="faster_rcnn", num_classes=80, depth=50,
                          gen_attn_stages=(False, False, True, True),
                          gen_attn_type="1111"),
        data=DataConfig(catsplit=(80,), samples_per_device=2,
                        img_scale=(1333, 800), bucket=(800, 1344),
                        aspect_buckets=((1344, 800), (800, 1344))),
        train=TrainConfig(base_lr=2e-2, weight_decay=1e-4, grad_clip=35.0,
                          epochs_per_task=12, step_epochs=(8, 11),
                          warmup_iters=500,
                          work_dir="work_dirs/faster_rcnn_attn_1111"),
        distill=DistillFlags(cates_distill="", feats_distill=""),
    )

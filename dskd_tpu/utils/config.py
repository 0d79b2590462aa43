"""Typed experiment configuration (replaces mmcv Config + registries).

The reference encodes everything — model, data, schedule, task plan, distill
recipe — in one nested dict with substring-matched flag strings (SURVEY §5
"Config / flag system"). Here the same option space is typed dataclasses;
the distill flag strings are still accepted and parsed once into
DistillConfig (dskd_tpu/distill/losses.py:DistillConfig.from_flags).

Config files are python modules exporting ``get_config() -> ExperimentConfig``
and may start from ``ExperimentConfig()`` defaults (the flagship 40+40 DSKD
recipe). CLI overrides use dotted paths: ``--set train.base_lr=1e-4``.
"""
from __future__ import annotations

import dataclasses
import importlib.util
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass
class ModelConfig:
    arch: str = "gfl_deformable_detr"
    num_classes: int = 80
    num_query: int = 300
    reg_max: int = 16
    depth: int = 50
    frozen_stages: int = 1
    embed_dims: int = 256
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_levels: int = 4
    dropout: float = 0.1
    # DCN stage switches (dcn config variants; bottleneck backbones only)
    dcn_stages: Tuple[bool, bool, bool, bool] = (False, False, False, False)
    # per-stage GCNet ContextBlock in the ResNet backbone (configs/gcnet)
    gcb_stages: Tuple[bool, bool, bool, bool] = (False, False, False, False)
    gcb_ratio: float = 0.25
    # per-stage GeneralizedAttention (configs/empirical_attention)
    gen_attn_stages: Tuple[bool, bool, bool, bool] = (False, False,
                                                      False, False)
    gen_attn_type: str = "1111"
    # GRoIE all-level bbox-roi extractor (configs/groie)
    groie: bool = False
    # DetectoRS variants on Cascade R-CNN (configs/detectors): recursive
    # feature pyramid and/or switchable atrous convolution
    rfp: bool = False
    sac: bool = False
    # vanilla deformable-DETR variants (transformer.py:906-1021 ladder)
    with_box_refine: bool = False
    as_two_stage: bool = False
    # DyHead attention blocks between neck and head (arch='atss')
    dyhead_blocks: int = 0
    # SSD variant (configs/ssd): 300 or 512 pick the VGG-extras /
    # anchor-ladder row; 320 is the SSDLite-MobileNetV2 recipe
    # (depthwise extras + head, trainable BN) — models/ssd.py SIZE_SPECS
    ssd_input_size: int = 300
    # stuff classes for the panoptic semantic branch (arch='panoptic_fpn')
    num_stuff_classes: int = 53
    # maskformer/mask2former: train the panoptic (things + stuff)
    # protocol — the head grows to num_classes + num_stuff_classes and
    # stuff GT rows are derived from the semantic map
    panoptic: bool = False
    # backbone spec for families that accept one (models/backbones.py):
    # '' = family-default ResNet(depth); 'regnetx_3.2gf', 'effb3',
    # 'hrnet_w18', 'swin_tiny', 'resnext'
    backbone: str = ""
    backbone_ckpt: Optional[str] = None   # torchvision-style weights
    # KD families (configs/ld, configs/lad): the frozen teacher's ResNet
    # depth when it differs from the student's (e.g. r18 student <- r101
    # teacher); None = same architecture as the student
    teacher_depth: Optional[int] = None
    # rematerialize transformer layers in the backward. OFF by default:
    # the flagship recipe (B=4/chip, 640x640) fits v5e HBM without it and
    # skipping the encoder recompute measures +15% step throughput
    # (PERF.md round 2). Enable for larger batches/models.
    remat: bool = False


@dataclass
class DataConfig:
    # dataset binding (replaces the mmdet dataset_type registry key):
    # 'coco' (TaskCocoDataset, the IL-capable default), 'voc'
    # (data/voc.py XML devkit), 'wider_face', 'cityscapes' (COCO-format
    # json from the offline converter), 'lvis', 'openimages'. Non-coco
    # types are single-task (catsplit=(N,)) — the reference trains them
    # plain, never incrementally.
    dataset_type: str = "coco"
    # custom class list for COCO-format jsons with non-COCO categories
    # (the mmdet CocoDataset-subclass pattern, e.g. deepfashion.py's 15
    # clothing classes); None = the standard 80-class COCO table
    classes: Optional[Tuple[str, ...]] = None
    train_ann: str = "data/coco/annotations/instances_train2017.json"
    val_ann: str = "data/coco/annotations/instances_val2017.json"
    train_img_prefix: str = "data/coco/train2017"
    val_img_prefix: str = "data/coco/val2017"
    # VOC/WIDER devkit root + split names (pascal_voc / wider_face
    # configs); the year picks the 07 11-point vs 12 area AP protocol
    data_root: str = ""
    train_split: str = "trainval"
    val_split: str = "test"
    voc_year: str = "2007"
    # OpenImages sidecar files (configs/openimages: class descriptions
    # CSV + label hierarchy json)
    cls_desc_file: str = ""
    hierarchy_file: str = ""
    # stuffthingmaps PNG dir for semantic-branch models (HTC); "" = void
    seg_prefix: str = ""
    catsplit: Tuple[int, ...] = (40, 40)
    catpred: str = "prev-cur"
    cat_split_load: str = "auto"
    imgpercent: float = 1.0
    samples_per_device: int = 8
    num_workers: int = 8
    max_gt: int = 100
    bucket: Tuple[int, int] = (640, 640)
    img_scale: Tuple[int, int] = (640, 640)
    flip_ratio: float = 0.5
    # aspect-ratio bucketing (GroupSampler, samplers/group_sampler.py:13-17):
    # (portrait_hw, landscape_hw) static canvases; None = single bucket.
    # e.g. ((800, 608), (608, 800)) cuts ~20% encoder tokens vs (800, 800)
    aspect_buckets: Optional[Tuple[Tuple[int, int], Tuple[int, int]]] = None
    # multi-scale training (Resize multiscale_mode='value'); the bucket
    # must cover the largest scale
    multi_scales: Optional[Tuple[Tuple[int, int], ...]] = None
    # GT-count bucketing: pad each batch's GT arrays to the smallest
    # bucket >= the batch's max valid-GT index instead of always max_gt.
    # The reference processes exactly the GT that exist (dynamic torch
    # shapes); a fixed max_gt=100 pad makes the Hungarian matcher + loss
    # tensors do ~3x the reference's work on typical COCO batches. One
    # compiled program per bucket (same trade as aspect_buckets).
    gt_buckets: Tuple[int, ...] = ()
    photo_metric_distortion: bool = False
    # YOLOX-style multi-image mixes (pipelines/transforms.py Mosaic/MixUp)
    mosaic: bool = False
    mixup: bool = False
    # AutoAugment detection policies (pipelines/auto_augment.py)
    auto_augment: bool = False
    # SSD geometric recipe (transforms.py Expand + MinIoURandomCrop)
    expand: bool = False
    min_iou_crop: bool = False
    # large-scale jitter (configs/strong_baselines): Resize ratio_range
    # 'range' mode + RandomCrop to a fixed canvas (masks follow the crop)
    resize_ratio_range: Optional[Tuple[float, float]] = None
    random_crop: Optional[Tuple[int, int]] = None


@dataclass
class TrainConfig:
    base_lr: float = 2e-4
    weight_decay: float = 1e-4
    grad_clip: float = 0.1
    warmup_iters: int = 1500
    warmup_ratio: float = 0.01
    step_epochs: Tuple[int, ...] = (8, 11)
    # 'step' (mmcv StepLrUpdaterHook) or 'yolox_cosine'
    # (YOLOXLrUpdaterHook: quadratic warmup + quarter cosine + fixed
    # floor over the last no_aug_epochs)
    lr_policy: str = "step"
    min_lr_ratio: float = 0.05
    epochs_per_task: int = 12
    # iter-based schedule (IterBasedRunner + InfiniteSampler equivalent):
    # when > 0, each task trains this many iterations from an endless
    # reshuffled stream instead of epochs_per_task epochs
    max_iters_per_task: int = 0
    seed: int = 42
    log_interval: int = 50
    ckpt_interval: int = 1          # epochs
    eval_interval: int = 1          # epochs; 0 = no eval during training
    resume_by_task: int = 0
    work_dir: str = "work_dirs/dskd"
    use_dropout: bool = True
    # ExpMomentumEMA (core/hook/ema.py): evaluate/checkpoint with an EMA of
    # the params while training on the raw ones
    use_ema: bool = False
    ema_momentum: float = 0.0002
    # YOLOXModeSwitchHook (core/hook/yolox_mode_switch_hook.py:52): disable
    # Mosaic/MixUp for the last N epochs of each task
    no_aug_epochs: int = 0
    # ZeRO/FSDP: shard params + optimizer moments over the data mesh axis
    # (parallel/fsdp.py; beyond the reference's replicated DDP)
    fsdp: bool = False


@dataclass
class DistillFlags:
    """The reference's flag-string recipe (chaosuan config :116-133)."""
    cates_distill: str = "hard + teacher-first"
    locat_distill: str = ""
    memory_distill: str = ""
    feats_distill: str = "corr + fg_info + decode_v1"
    teacher_score_thr: float = 0.3
    teacher_max_per_img: int = 100
    # False = faithful reference fg-distill grad direction (teacher on the
    # KL pred side — sg_out/fg_only carry no student grads); True = the
    # corrected student-side direction (distill/losses.py DistillConfig)
    fix_fg_grad_direction: bool = False


@dataclass
class ExperimentConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    distill: DistillFlags = field(default_factory=DistillFlags)
    test_score_thr: float = 0.0
    test_max_per_img: int = 100
    # two-stage (Faster R-CNN) knobs: train-time proposal budget after NMS
    # and sampled ROIs per image (train_cfg.rcnn sampler num=512)
    rcnn_num_proposals: int = 512
    rcnn_num_samples: int = 512


def dskd_flagship_config(catsplit=(40, 40),
                         work_dir="work_dirs/dskd") -> ExperimentConfig:
    """The flagship DSKD recipe parameterized by the class split
    (chaosuan_gfl_deformable_detr_{40,50,60,70}_*_il.py family)."""
    return ExperimentConfig(
        model=ModelConfig(num_classes=80, depth=50),
        # aspect buckets = the reference's GroupSampler + per-batch padding
        # made static: landscape/portrait canvases carry ~27% fewer encoder
        # tokens than a square 640 pad (measured +34% step throughput on
        # chip — PERF.md round 3)
        data=DataConfig(catsplit=tuple(catsplit), samples_per_device=8,
                        aspect_buckets=((640, 480), (480, 640)),
                        # GT-count buckets: the matcher/loss shapes track
                        # the batch's real GT count instead of max_gt=100
                        # (typical COCO batch -> the 32 bucket)
                        gt_buckets=(8, 16, 32, 64, 100)),
        train=TrainConfig(base_lr=2e-4, epochs_per_task=12,
                          step_epochs=(8, 11), work_dir=work_dir),
        distill=DistillFlags(
            cates_distill="hard + teacher-first",
            feats_distill="corr + fg_info + decode_v1",
            teacher_score_thr=0.3, teacher_max_per_img=100),
    )


def update_data_root(cfg: ExperimentConfig) -> ExperimentConfig:
    """DSKD_DATASETS env rewrite (parity: mmdet utils/misc.py
    update_data_root + the MMDET_DATASETS env var): when set, every
    dataset path beginning with the conventional ``data/`` prefix is
    re-rooted there, so one config runs against any data mount."""
    import os
    root = os.environ.get("DSKD_DATASETS")
    if not root:
        return cfg
    root = root.rstrip("/") + "/"

    def rw(p: str) -> str:
        return root + p[len("data/"):] if p.startswith("data/") else p

    cfg.data = dataclasses.replace(
        cfg.data, train_ann=rw(cfg.data.train_ann),
        val_ann=rw(cfg.data.val_ann),
        train_img_prefix=rw(cfg.data.train_img_prefix),
        val_img_prefix=rw(cfg.data.val_img_prefix),
        data_root=rw(cfg.data.data_root),
        seg_prefix=rw(cfg.data.seg_prefix),
        cls_desc_file=rw(cfg.data.cls_desc_file),
        hierarchy_file=rw(cfg.data.hierarchy_file))
    return cfg


def load_config(path: str) -> ExperimentConfig:
    spec = importlib.util.spec_from_file_location("exp_config", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return update_data_root(mod.get_config())


def apply_overrides(cfg: ExperimentConfig, overrides: Sequence[str]):
    """'a.b.c=value' dotted assignment with literal-eval values."""
    import ast
    for ov in overrides:
        path, _, raw = ov.partition("=")
        keys = path.strip().split(".")
        obj = cfg
        for k in keys[:-1]:
            obj = getattr(obj, k)
        try:
            val = ast.literal_eval(raw)
        except (SyntaxError, ValueError):
            val = raw
        setattr(obj, keys[-1], val)
    return cfg

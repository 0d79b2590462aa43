"""mmdet/mmcv config importer: load the reference's python config files
(with ``_base_`` inheritance) and map them onto ExperimentConfig.

Parity surface: mmcv Config.fromfile semantics (python variant) —
module-level variables form the dict, ``_base_`` (str or list) pulls in
parent files relative to the child, children deep-merge over parents,
and a ``_delete_=True`` key replaces the parent subtree instead of
merging (mmcv config.py _merge_a_into_b contract). The mapper then
translates the familiar mmdet keys (model.type, backbone.depth,
optimizer.lr, lr_config.step, data.train.pipeline, ...) onto the typed
ExperimentConfig, reporting every key it consciously ignored so a
migrating user sees exactly what transferred.

Like the reference's own loader, ``load_mmdet_config`` EXECUTES the
config file as python — only point it at files you trust.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Tuple

from .config import ExperimentConfig

DELETE_KEY = "_delete_"
BASE_KEY = "_base_"

# model.type -> (arch, extra ModelConfig overrides)
ARCH_MAP = {
    "FasterRCNN": "faster_rcnn",
    "MaskRCNN": "mask_rcnn",
    "MaskScoringRCNN": "ms_rcnn",
    "CascadeRCNN": "cascade_rcnn",
    "HybridTaskCascade": "htc",
    "SCNet": "scnet",
    "PointRend": "point_rend",
    "QueryInst": "queryinst",
    "SparseRCNN": "sparse_rcnn",
    "GridRCNN": "grid_rcnn",
    "TridentFasterRCNN": "tridentnet",
    "FastRCNN": "fast_rcnn",
    "RetinaNet": "retinanet",
    "FCOS": "fcos",
    "NASFCOS": "nasfcos",
    "ATSS": "atss",
    "GFL": "gfl",
    "PAA": "paa",
    "VFNet": "vfnet",
    "TOOD": "tood",
    "FOVEA": "foveabox",
    "FSAF": "fsaf",
    "AutoAssign": "autoassign",
    "RepPointsDetector": "reppoints",
    "FreeAnchorRetinaNet": "free_anchor",
    "CornerNet": "cornernet",
    "CentripetalNet": "centripetalnet",
    "CenterNet": "centernet",
    "YOLOV3": "yolov3",
    "YOLOF": "yolof",
    "YOLOX": "yolox",
    "YOLOY": "yoloy",
    "DETR": "detr",
    "DeformableDETR": "deformable_detr",
    "SOLO": "solo",
    "YOLACT": "yolact",
    "PanopticFPN": "panoptic_fpn",
    "MaskFormer": "maskformer",
    "Mask2Former": "mask2former",
    "KnowledgeDistillationSingleStageDetector": "ld",
    "LAD": "lad",
    "RPN": "rpn",
    # the DSKD fork's IL detectors
    "GFLDeformableDETR": "gfl_deformable_detr",
    "DeformableDETR_il": "gfl_deformable_detr",
    "DETR_il": "detr",
}

DATASET_MAP = {
    "CocoDataset": "coco",
    "CocoSplitDataset": "coco",
    "VOCDataset": "voc",
    "WIDERFaceDataset": "wider_face",
    "CityscapesDataset": "cityscapes",
    "LVISDataset": "lvis",
    "LVISV1Dataset": "lvis",
    "OpenImagesDataset": "openimages",
    "OpenImagesChallengeDataset": "openimages",
    "DeepFashionDataset": "coco",
    "CocoPanopticDataset": "coco",
}




def _deepfashion_classes():
    """Load the canonical list from data/deepfashion.py WITHOUT importing
    the data package (whose __init__ pulls the jax-backed loader — the
    CLI importer must run device-free)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "_deepfashion", os.path.join(os.path.dirname(__file__), "..",
                                     "data", "deepfashion.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.DEEPFASHION_CLASSES


def _merge(child: Dict, parent: Dict) -> Dict:
    """mmcv _merge_a_into_b: child wins; dicts merge recursively unless
    the child carries _delete_=True."""
    out = dict(parent)
    for k, v in child.items():
        if (isinstance(v, dict) and isinstance(out.get(k), dict)
                and not v.get(DELETE_KEY, False)):
            out[k] = _merge(v, out[k])
        else:
            if isinstance(v, dict):
                v = {kk: vv for kk, vv in v.items() if kk != DELETE_KEY}
            out[k] = v
    return out


def load_mmdet_config(path: str) -> Dict[str, Any]:
    path = os.path.abspath(path)
    ns: Dict[str, Any] = {}
    with open(path) as f:
        code = f.read()
    exec(compile(code, path, "exec"), ns)
    cfg = {k: v for k, v in ns.items()
           if not k.startswith("__") and not callable(v)
           and not isinstance(v, type(os))}
    bases = cfg.pop(BASE_KEY, [])
    if isinstance(bases, str):
        bases = [bases]
    merged: Dict[str, Any] = {}
    for b in bases:
        base_cfg = load_mmdet_config(os.path.join(os.path.dirname(path), b))
        merged = _merge(base_cfg, merged)
    return _merge(cfg, merged)


def _round32(x: int) -> int:
    return -(-int(x) // 32) * 32


def _pipeline_flags(pipeline: List[Dict], data_kw: Dict,
                    ignored: List[str]):
    pad_divisor = None
    img_scale = None
    for t in pipeline or []:
        tt = t.get("type")
        if tt == "Resize":
            sc = t.get("img_scale")
            if isinstance(sc, (list, tuple)) and sc and \
                    isinstance(sc[0], (list, tuple)):
                data_kw["multi_scales"] = tuple(tuple(s) for s in sc)
                sc = max(sc, key=lambda s: s[0] * s[1])
            if sc:
                data_kw["img_scale"] = tuple(sc)
                img_scale = sc
            if t.get("ratio_range"):
                data_kw["resize_ratio_range"] = tuple(t["ratio_range"])
        elif tt == "Pad":
            pad_divisor = t.get("size_divisor")
        elif tt == "RandomFlip":
            data_kw["flip_ratio"] = t.get("flip_ratio", 0.5) or 0.0
        elif tt == "PhotoMetricDistortion":
            data_kw["photo_metric_distortion"] = True
        elif tt == "Expand":
            data_kw["expand"] = True
        elif tt == "MinIoURandomCrop":
            data_kw["min_iou_crop"] = True
        elif tt == "RandomCrop":
            cs = t.get("crop_size")
            if cs:
                data_kw["random_crop"] = (int(cs[0]), int(cs[1]))
        elif tt == "Mosaic":
            data_kw["mosaic"] = True
        elif tt == "MixUp":
            data_kw["mixup"] = True
        elif tt == "AutoAugment":
            data_kw["auto_augment"] = True
        elif tt in ("LoadImageFromFile", "LoadAnnotations", "Normalize",
                    "DefaultFormatBundle", "Collect",
                    "MultiScaleFlipAug", "ImageToTensor",
                    "FilterAnnotations"):
            pass                                   # structural / implicit
        else:
            ignored.append(f"pipeline.{tt}")
    if img_scale is not None:
        # canvas = Pad(size_divisor) rounding when the pipeline pads;
        # the exact scale otherwise (e.g. SSD300's divisor-free 300x300)
        long_, short = max(img_scale), min(img_scale)
        if pad_divisor:
            d = int(pad_divisor)
            data_kw["bucket"] = (-(-int(short) // d) * d,
                                 -(-int(long_) // d) * d)
        else:
            data_kw["bucket"] = (int(short), int(long_))


def _route_variant(model: Dict, model_kw: Dict[str, Any],
                   ignored: List[str]) -> None:
    """Registry-faithful variant routing.

    The reference's builder dispatches on the head/roi_head/neck ``type``
    registry keys (mmdet/models/builder.py:59), so a config whose
    bbox_head (or roi_head members, or neck) names a variant must build
    the variant family — e.g. retinanet + GARetinaHead is guided-anchor
    RetinaNet, CascadeRCNN + mask_head is Cascade *Mask* R-CNN. Anything
    this mapping genuinely drops is appended to ``ignored`` so the
    migrating user sees the loss instead of silently getting a different
    model.
    """
    arch = model_kw.get("arch")
    bh = model.get("bbox_head") or {}
    bh = bh if isinstance(bh, dict) else {}
    bh_type = bh.get("type", "")
    roi = model.get("roi_head") or {}
    roi = roi if isinstance(roi, dict) else {}
    neck = model.get("neck")
    if isinstance(neck, dict):
        neck_types = [neck.get("type")]
    elif isinstance(neck, (list, tuple)):
        neck_types = [n.get("type") for n in neck if isinstance(n, dict)]
    else:
        neck_types = []
    loss_cls = (bh.get("loss_cls") or {}).get("type", "")

    if arch == "retinanet":
        head_route = {"GARetinaHead": "ga_retina",
                      "SABLRetinaHead": "sabl_retina",
                      "FreeAnchorRetinaHead": "free_anchor",
                      "PISARetinaHead": "pisa_retinanet"}
        if "FPG" in neck_types:
            arch = "retinanet_fpg"
        elif "NASFPN" in neck_types:
            arch = "retinanet_nasfpn"
        elif bh_type in head_route:
            arch = head_route[bh_type]
        elif loss_cls == "GHMC":
            arch = "retinanet_ghm"
        elif bh_type == "RetinaSepBNHead":
            # SepBN head outside the NAS-FPN recipe (e.g. EfficientNet's
            # crop-896 config keeps the FPN neck)
            ignored.append("bbox_head.type=RetinaSepBNHead "
                           "(shared-conv/separate-BN head -> standard "
                           "retina head)")
        if "BFP" in neck_types:
            ignored.append("neck.BFP on retinanet (libra balanced-FPN -> "
                           "FPN; only libra_faster_rcnn has a dedicated "
                           "arch)")
    elif arch == "faster_rcnn":
        roi_route = {"DoubleHeadRoIHead": "double_head_rcnn",
                     "DynamicRoIHead": "dynamic_rcnn",
                     "PISARoIHead": "pisa_faster_rcnn"}
        arch = roi_route.get(roi.get("type", ""), arch)
        if "BFP" in neck_types:
            arch = "libra_faster_rcnn"
        elif "FPN_CARAFE" in neck_types:
            arch = "carafe_faster_rcnn"
        if (model.get("backbone") or {}).get(
                "conv_cfg", {}).get("type") == "ConvWS":
            arch = "faster_rcnn_gn_ws"
        rpn_t = (model.get("rpn_head") or {}).get("type", "")
        if rpn_t == "GARPNHead":
            ignored.append("rpn_head.type=GARPNHead "
                           "(guided-anchor RPN -> standard RPN)")
        elif rpn_t == "CascadeRPNHead":
            ignored.append("rpn_head.type=CascadeRPNHead "
                           "(cascade RPN -> standard RPN; the standalone "
                           "cascade_rpn arch covers the RPN itself)")
    elif arch == "cascade_rcnn" and roi.get("mask_head") is not None:
        arch = "cascade_mask_rcnn"
    elif arch == "mask_rcnn":
        bbox_heads = roi.get("bbox_head")
        bbox_heads = (bbox_heads if isinstance(bbox_heads, list)
                      else [bbox_heads] if isinstance(bbox_heads, dict)
                      else [])
        if any((h.get("loss_cls") or {}).get("type") == "SeesawLoss"
               for h in bbox_heads):
            arch = "mask_rcnn_seesaw"
        if (roi.get("mask_roi_extractor") or {}).get("type") \
                == "GenericRoIExtractor":
            ignored.append("roi_head.mask_roi_extractor=GenericRoIExtractor"
                           " (mask-branch GRoIE -> standard extractor)")
        if roi.get("type") == "PISARoIHead":
            ignored.append("roi_head.type=PISARoIHead on mask_rcnn "
                           "(PISA sampling -> standard; only "
                           "pisa_faster_rcnn has a dedicated arch)")
    elif arch == "deformable_detr" and bh_type == "GFLDeformableDETRHead":
        # non-IL GFL-distribution head (gfl_deformable_detr_head.py)
        arch = "gfl_deformable_detr"
    elif arch == "rpn":
        # the RPN detector carries its head under rpn_head, not bbox_head
        rpn_t = (model.get("rpn_head") or {}).get("type", "")
        if rpn_t == "GARPNHead":
            arch = "ga_rpn"
        elif rpn_t == "CascadeRPNHead":
            arch = "cascade_rpn"
    elif arch == "cornernet" and bh_type == "CentripetalHead":
        arch = "centripetalnet"
    elif arch == "fast_rcnn" and "BFP" in neck_types:
        # Libra fast-rcnn: no dedicated arch — keep the base family but
        # surface the dropped balanced-feature pyramid
        ignored.append("neck.BFP on fast_rcnn (libra balanced-FPN -> FPN; "
                       "only libra_faster_rcnn has a dedicated arch)")
    if arch in ("faster_rcnn", "cascade_rcnn", "cascade_mask_rcnn"):
        bbox_heads = roi.get("bbox_head")
        bbox_heads = (bbox_heads if isinstance(bbox_heads, list)
                      else [bbox_heads] if isinstance(bbox_heads, dict)
                      else [])
        if any(isinstance(h, dict) and h.get("type") == "SABLHead"
               for h in bbox_heads):
            ignored.append("roi_head.bbox_head.type=SABLHead (two-stage "
                           "side-aware bucketing head -> Shared2FC; only "
                           "sabl_retina has a dedicated arch)")
    elif arch == "atss" and "DyHead" in neck_types:
        for n in (model.get("neck") if isinstance(model.get("neck"),
                                                  (list, tuple))
                  else [model.get("neck") or {}]):
            if isinstance(n, dict) and n.get("type") == "DyHead":
                model_kw["dyhead_blocks"] = int(n.get("num_blocks", 6))
    elif arch == "solo":
        if bh_type == "DecoupledSOLOHead" or (
                model.get("mask_head") or {}).get("type") \
                == "DecoupledSOLOHead":
            arch = "decoupled_solo"
        elif bh_type == "DecoupledSOLOLightHead" or (
                model.get("mask_head") or {}).get("type") \
                == "DecoupledSOLOLightHead":
            arch = "decoupled_solo_light"
    model_kw["arch"] = arch


def _find_num_classes(model: Dict):
    for head_key in ("bbox_head", "mask_head", "panoptic_head"):
        h = model.get(head_key)
        if isinstance(h, dict) and "num_classes" in h:
            return h["num_classes"]
        if isinstance(h, list):
            for hh in h:
                if "num_classes" in hh:
                    return hh["num_classes"]
    roi = model.get("roi_head", {})
    if isinstance(roi, dict):
        bh = roi.get("bbox_head")
        if isinstance(bh, dict) and "num_classes" in bh:
            return bh["num_classes"]
        if isinstance(bh, list):
            for hh in bh:
                if "num_classes" in hh:
                    return hh["num_classes"]
    return None


def mmdet_to_experiment(cfg: Dict[str, Any]) \
        -> Tuple[ExperimentConfig, List[str]]:
    """Best-effort translation; returns (ExperimentConfig, ignored_keys).

    ``ignored_keys`` lists mmdet options the rebuild either implies
    structurally (DataContainer formatting, norm configs already baked
    into each family) or does not carry — the migrating user's checklist.
    """
    ignored: List[str] = []
    exp = ExperimentConfig()

    model = cfg.get("model", {})
    mtype = model.get("type")
    model_kw: Dict[str, Any] = {}
    if mtype in ARCH_MAP:
        model_kw["arch"] = ARCH_MAP[mtype]
    elif mtype == "SingleStageDetector":
        # ssd-style configs name the generic detector; key off the head
        head = (model.get("bbox_head") or {}).get("type", "")
        model_kw["arch"] = {"SSDHead": "ssd", "PISASSDHead": "pisa_ssd",
                            "YOLOV3Head": "yolov3"}.get(head, "")
        if not model_kw["arch"]:
            ignored.append(f"model.type={mtype}/{head}")
        if model_kw["arch"] in ("ssd", "pisa_ssd"):
            # ssd512_coco.py declares its variant on the anchor
            # generator; ssdlite declares use_depthwise on the head
            bh = model.get("bbox_head") or {}
            gen = bh.get("anchor_generator") or {}
            if bh.get("use_depthwise"):
                model_kw["ssd_input_size"] = 320
            elif int(gen.get("input_size", 300)) == 512:
                model_kw["ssd_input_size"] = 512
    elif mtype is not None:
        # explicit empty arch: ModelConfig defaults to the flagship, and
        # an unmapped type must NOT silently become it
        model_kw["arch"] = ""
        ignored.append(f"model.type={mtype} (no family mapping)")
    if model_kw.get("arch"):
        _route_variant(model, model_kw, ignored)

    bb = model.get("backbone", {})
    if "depth" in bb:
        model_kw["depth"] = int(bb["depth"])
    if "frozen_stages" in bb:
        model_kw["frozen_stages"] = int(bb["frozen_stages"])
    bb_type = bb.get("type")
    bb_spec = {"ResNeXt": "resnext", "Res2Net": "res2net",
               "ResNeSt": "resnest", "SwinTransformer": "swin_tiny",
               "PyramidVisionTransformer": "pvt_tiny",
               "RegNet": "regnetx_3.2gf", "EfficientNet": "effb3",
               "HRNet": "hrnet_w18"}.get(bb_type)
    if bb_spec:
        model_kw["backbone"] = bb_spec
    elif bb_type == "MobileNetV2" and model_kw.get("arch") == "yolov3":
        # the yolov3_mobilenetv2 recipe (96-channel neck, leaky acts)
        model_kw["backbone"] = "mobilenet_v2"
    elif bb_type in ("DetectoRS_ResNet", "DetectoRS_ResNeXt"):
        # SAC rides the backbone cfg (configs/detectors)
        if bb.get("sac"):
            model_kw["sac"] = True
    elif bb_type not in (None, "ResNet", "SSDVGG", "Darknet",
                         "CSPDarknet", "MobileNetV2", "HourglassNet",
                         "TridentResNet"):
        ignored.append(f"backbone.type={bb_type}")
    neck = model.get("neck") or {}
    neck_type = neck.get("type") if isinstance(neck, dict) else None
    if neck_type == "RFP":
        model_kw["rfp"] = True
        rfp_bb = (neck.get("rfp_backbone") or {})
        if rfp_bb.get("sac") or bb.get("sac"):
            model_kw["sac"] = True
    elif neck_type == "PAFPN" and model_kw.get("arch") == "faster_rcnn":
        model_kw["arch"] = "faster_rcnn_pafpn"
    elif neck_type not in (None, "FPN", "ChannelMapper",
                           "DilatedEncoder", "YOLOXPAFPN", "YOLOYPAFPN",
                           "YOLOV3Neck", "CTResNetNeck", "SSDNeck",
                           "HRFPN", "NASFCOS_FPN", "NASFPN", "FPG",
                           "BFP", "FPN_CARAFE", "DyHead", "PAFPN"):
        ignored.append(f"neck.type={neck_type}")
    if bb.get("dcn") and bb.get("stage_with_dcn"):
        model_kw["dcn_stages"] = tuple(bool(x)
                                       for x in bb["stage_with_dcn"])
    for plugin in bb.get("plugins") or []:
        ptype = (plugin.get("cfg") or {}).get("type")
        stages = tuple(bool(x) for x in plugin.get("stages",
                                                   (False,) * 4))
        if ptype == "ContextBlock":
            model_kw["gcb_stages"] = stages
            if "ratio" in plugin["cfg"]:
                model_kw["gcb_ratio"] = plugin["cfg"]["ratio"]
        elif ptype == "GeneralizedAttention":
            model_kw["gen_attn_stages"] = stages
            model_kw["gen_attn_type"] = plugin["cfg"].get(
                "attention_type", "1111")
        else:
            ignored.append(f"backbone.plugins.{ptype}")
    if model.get("roi_head", {}).get("bbox_roi_extractor", {}) \
            .get("type") == "GenericRoIExtractor":
        model_kw["groie"] = True
    nc = _find_num_classes(model)
    if nc is not None:
        model_kw["num_classes"] = int(nc)
    tr = model.get("transformer") or (model.get("bbox_head") or {}) \
        .get("transformer") or {}
    if tr.get("as_two_stage"):
        model_kw["as_two_stage"] = True
    if (model.get("bbox_head") or {}).get("with_box_refine") \
            or model.get("with_box_refine"):
        model_kw["with_box_refine"] = True
    exp.model = dataclasses.replace(exp.model, **model_kw)

    # the DSKD fork's distill recipe rides the IL head's config
    # (gfl_deformable_detr_head_il.py flag strings, chaosuan :116-119)
    bh = model.get("bbox_head") or {}
    distill_kw = {k: bh[k] for k in ("cates_distill", "locat_distill",
                                     "memory_distill", "feats_distill")
                  if k in bh}
    tcfg = bh.get("teacher_test_cfg") or {}
    if "score_thr" in tcfg:
        distill_kw["teacher_score_thr"] = float(tcfg["score_thr"])
    if "max_per_img" in tcfg:
        distill_kw["teacher_max_per_img"] = int(tcfg["max_per_img"])
    if distill_kw:
        exp.distill = dataclasses.replace(exp.distill, **distill_kw)
    elif mtype in ("GFLDeformableDETR", "DeformableDETR_il", "DETR_il"):
        # IL detector without explicit flags: do not inherit the
        # flagship defaults silently
        exp.distill = dataclasses.replace(exp.distill, cates_distill="",
                                          feats_distill="")

    data = cfg.get("data", {})
    data_kw: Dict[str, Any] = {}
    if "samples_per_gpu" in data:
        data_kw["samples_per_device"] = int(data["samples_per_gpu"])
    if "workers_per_gpu" in data:
        data_kw["num_workers"] = int(data["workers_per_gpu"])
    train_d = data.get("train", {})
    # unwrap RepeatDataset / ClassBalancedDataset / MultiImageMixDataset
    while isinstance(train_d, dict) and "dataset" in train_d:
        train_d = train_d["dataset"]
    val_d = data.get("val", {})
    dtype = train_d.get("type") or cfg.get("dataset_type")
    if dtype in DATASET_MAP:
        data_kw["dataset_type"] = DATASET_MAP[dtype]
    elif dtype:
        ignored.append(f"dataset_type={dtype}")
    if train_d.get("ann_file"):
        af = train_d["ann_file"]
        data_kw["train_ann"] = af if isinstance(af, str) else af[0]
    if train_d.get("img_prefix"):
        data_kw["train_img_prefix"] = train_d["img_prefix"]
    if val_d.get("ann_file"):
        va = val_d["ann_file"]
        data_kw["val_ann"] = va if isinstance(va, str) else va[0]
    if val_d.get("img_prefix"):
        data_kw["val_img_prefix"] = val_d["img_prefix"]
    if train_d.get("classes"):
        data_kw["classes"] = tuple(train_d["classes"])
    elif dtype == "DeepFashionDataset":
        data_kw["classes"] = _deepfashion_classes()
    _pipeline_flags(train_d.get("pipeline") or cfg.get("train_pipeline"),
                    data_kw, ignored)
    if "num_classes" in model_kw:
        data_kw["catsplit"] = (model_kw["num_classes"],)
    # the DSKD fork's incremental task plan rides the dataset dict
    if train_d.get("catsplit"):
        data_kw["catsplit"] = tuple(train_d["catsplit"])
    if train_d.get("catpred"):
        data_kw["catpred"] = train_d["catpred"]
    if "imgpercent" in train_d:
        data_kw["imgpercent"] = float(train_d["imgpercent"])
    if data.get("cat_split_load"):
        data_kw["cat_split_load"] = data["cat_split_load"]
    exp.data = dataclasses.replace(exp.data, **data_kw)

    train_kw: Dict[str, Any] = {}
    opt = cfg.get("optimizer", {})
    if isinstance(opt, list):
        # fork IL configs carry one optimizer per task; the rebuild
        # rebuilds its per-task optimizer from one schedule (task 1's)
        ignored.append(f"optimizer[1:]  ({len(opt)} per-task entries)")
        opt = opt[0] if opt else {}
    lr_list = cfg.get("lr_config")
    if isinstance(lr_list, list):
        ignored.append(f"lr_config[1:]  ({len(lr_list)} per-task entries)")
        cfg = dict(cfg, lr_config=lr_list[0] if lr_list else {})
    runner_list = cfg.get("runner")
    if isinstance(runner_list, list):
        ignored.append(f"runner[1:]  ({len(runner_list)} per-task entries)")
        cfg = dict(cfg, runner=runner_list[0] if runner_list else {})
    if "lr" in opt:
        train_kw["base_lr"] = float(opt["lr"])
    if "weight_decay" in opt:
        train_kw["weight_decay"] = float(opt["weight_decay"])
    if opt.get("type") not in (None, "SGD", "AdamW", "Adam"):
        ignored.append(f"optimizer.type={opt.get('type')}")
    oc = cfg.get("optimizer_config", {}) or {}
    if isinstance(oc, list):
        oc = oc[0] if oc else {}
    gc = oc.get("grad_clip")
    if gc and "max_norm" in gc:
        train_kw["grad_clip"] = float(gc["max_norm"])
    lr_cfg = cfg.get("lr_config", {}) or {}
    if lr_cfg.get("step"):
        train_kw["step_epochs"] = tuple(lr_cfg["step"])
    if "warmup_iters" in lr_cfg:
        train_kw["warmup_iters"] = int(lr_cfg["warmup_iters"])
    if "warmup_ratio" in lr_cfg:
        train_kw["warmup_ratio"] = float(lr_cfg["warmup_ratio"])
    if lr_cfg.get("policy") not in (None, "step"):
        ignored.append(f"lr_config.policy={lr_cfg.get('policy')}")
    task = cfg.get("task", {}) or {}
    if isinstance(task, dict) and task.get("resume_by_task"):
        rbt = task["resume_by_task"]
        if isinstance(rbt, int) and rbt:
            train_kw["resume_by_task"] = rbt
    runner = cfg.get("runner", {}) or {}
    if "max_epochs" in runner:
        train_kw["epochs_per_task"] = int(runner["max_epochs"])
    elif "max_iters" in runner:
        train_kw["max_iters_per_task"] = int(runner["max_iters"])
    exp.train = dataclasses.replace(exp.train, **train_kw)

    for k in ("fp16", "custom_hooks", "custom_imports", "evaluation",
              "checkpoint_config", "log_config", "auto_scale_lr"):
        if k in cfg:
            ignored.append(k)
    return exp, ignored

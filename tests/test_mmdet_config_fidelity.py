"""Importer fidelity sweep over ALL reference configs.

The reference's builder dispatches on registry ``type`` keys
(mmdet/models/builder.py:59): a config naming a variant head/roi_head/
neck must build the variant family. Round-3 review found ~100 configs
silently collapsing to a lossy base family (cascade-mask -> box-only
cascade, GARetinaHead -> plain retinanet, ...). This sweep pins the
routing for every one of the reference's 605 configs: each config
directory's arch multiset is asserted exactly, so any future regression
to a lossy mapping fails loudly here.
"""
import collections
import os

import pytest

REF = "/root/reference/configs"

# directory -> {arch: count} over every config with a model.type
# (4 of the 605 are data/schedule-only 'common' bases with no model).
EXPECTED = {
    "albu_example": {"mask_rcnn": 1},
    "atss": {"atss": 2},
    "autoassign": {"autoassign": 1},
    "carafe": {"carafe_faster_rcnn": 1, "mask_rcnn": 1},
    "cascade_rcnn": {"cascade_mask_rcnn": 17, "cascade_rcnn": 10},
    "cascade_rpn": {"cascade_rpn": 1, "fast_rcnn": 1, "faster_rcnn": 1},
    "centernet": {"centernet": 2},
    "centripetalnet": {"centripetalnet": 1},
    "cityscapes": {"faster_rcnn": 1, "mask_rcnn": 1},
    "cornernet": {"cornernet": 3},
    "dcn": {"cascade_mask_rcnn": 3, "cascade_rcnn": 2, "faster_rcnn": 4,
            "mask_rcnn": 3},
    "dcnv2": {"faster_rcnn": 3, "mask_rcnn": 2},
    "deepfashion": {"mask_rcnn": 1},
    "deformable_detr": {"deformable_detr": 7, "gfl_deformable_detr": 16},
    "detectors": {"cascade_rcnn": 3, "htc": 4},
    "detr": {"detr": 1},
    "double_heads": {"double_head_rcnn": 1},
    "dyhead": {"atss": 2},
    "dynamic_rcnn": {"dynamic_rcnn": 1},
    "efficientnet": {"retinanet": 1},
    "empirical_attention": {"faster_rcnn": 4},
    "fast_rcnn": {"fast_rcnn": 6},
    "faster_rcnn": {"faster_rcnn": 35},
    "fcos": {"fcos": 9},
    "foveabox": {"foveabox": 8},
    "fpg": {"faster_rcnn": 3, "mask_rcnn": 3, "retinanet_fpg": 2},
    "free_anchor": {"free_anchor": 3},
    "fsaf": {"fsaf": 3},
    "gcnet": {"cascade_mask_rcnn": 6, "mask_rcnn": 13},
    "gfl": {"gfl": 6},
    "ghm": {"retinanet_ghm": 4},
    "gn": {"mask_rcnn": 6},
    "gn+ws": {"faster_rcnn_gn_ws": 4, "mask_rcnn": 8},
    "grid_rcnn": {"grid_rcnn": 5},
    "groie": {"faster_rcnn": 1, "grid_rcnn": 1, "mask_rcnn": 3},
    "guided_anchoring": {"fast_rcnn": 1, "faster_rcnn": 5, "ga_retina": 6,
                         "ga_rpn": 5},
    "hrnet": {"cascade_mask_rcnn": 3, "cascade_rcnn": 3, "faster_rcnn": 6,
              "fcos": 7, "htc": 5, "mask_rcnn": 6},
    "htc": {"htc": 7},
    "instaboost": {"cascade_mask_rcnn": 3, "mask_rcnn": 3},
    "lad": {"lad": 2},
    "ld": {"ld": 4},
    "legacy_1.x": {"cascade_mask_rcnn": 1, "faster_rcnn": 1, "mask_rcnn": 1,
                   "retinanet": 2, "ssd": 1},
    "libra_rcnn": {"fast_rcnn": 1, "libra_faster_rcnn": 3, "retinanet": 1},
    "lvis": {"mask_rcnn": 8},
    "mask2former": {"mask2former": 2},
    "mask_rcnn": {"mask_rcnn": 26},
    "maskformer": {"maskformer": 1},
    "ms_rcnn": {"ms_rcnn": 8},
    "nas_fcos": {"nasfcos": 2},
    "nas_fpn": {"retinanet": 1, "retinanet_nasfpn": 1},
    "openimages": {"faster_rcnn": 2, "retinanet": 1, "ssd": 1},
    "paa": {"paa": 7},
    "pafpn": {"faster_rcnn_pafpn": 1},
    "panoptic_fpn": {"panoptic_fpn": 4},
    "pascal_voc": {"faster_rcnn": 2, "retinanet": 1, "ssd": 2},
    "pisa": {"mask_rcnn": 2, "pisa_faster_rcnn": 2, "pisa_retinanet": 2,
             "pisa_ssd": 2},
    "point_rend": {"point_rend": 2},
    "pvt": {"retinanet": 10},
    "queryinst": {"queryinst": 5},
    "regnet": {"cascade_mask_rcnn": 5, "faster_rcnn": 7, "mask_rcnn": 11,
               "retinanet": 3},
    "reppoints": {"reppoints": 10},
    "res2net": {"cascade_mask_rcnn": 1, "cascade_rcnn": 1, "faster_rcnn": 1,
                "htc": 1, "mask_rcnn": 1},
    "resnest": {"cascade_mask_rcnn": 2, "cascade_rcnn": 2, "faster_rcnn": 2,
                "mask_rcnn": 2},
    "resnet_strikes_back": {"cascade_mask_rcnn": 1, "faster_rcnn": 1,
                            "mask_rcnn": 1, "retinanet": 1},
    "retinanet": {"retinanet": 19},
    "rpn": {"rpn": 11},
    "sabl": {"cascade_rcnn": 2, "faster_rcnn": 2, "sabl_retina": 6},
    "scnet": {"scnet": 5},
    "scratch": {"faster_rcnn": 1, "mask_rcnn": 1},
    "seesaw_loss": {"cascade_mask_rcnn": 4, "mask_rcnn_seesaw": 8},
    "selfsup_pretrain": {"mask_rcnn": 4},
    "solo": {"decoupled_solo": 2, "decoupled_solo_light": 1, "solo": 2},
    "sparse_rcnn": {"sparse_rcnn": 5},
    "ssd": {"ssd": 3},
    "strong_baselines": {"mask_rcnn": 6},
    "swin": {"mask_rcnn": 4, "retinanet": 1},
    "timm_example": {"retinanet": 2},
    "tood": {"tood": 7},
    "tridentnet": {"tridentnet": 3},
    "vfnet": {"vfnet": 13},
    "wider_face": {"ssd": 1},
    "yolact": {"yolact": 3},
    "yolo": {"yolov3": 6},
    "yolof": {"yolof": 8},
    "yolox": {"yolox": 10},
    "yoloy": {"yolox": 2, "yoloy": 3},
}

# variant registry types whose presence in a merged config must NOT
# route to the plain base family (the round-3 silent-collapse list)
VARIANT_HEAD_TO_FORBIDDEN = {
    "GARetinaHead": "retinanet",
    "SABLRetinaHead": "retinanet",
    "FreeAnchorRetinaHead": "retinanet",
    "PISARetinaHead": "retinanet",
    "GFLDeformableDETRHead": "deformable_detr",
    "DecoupledSOLOHead": "solo",
    "DecoupledSOLOLightHead": "solo",
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference configs not present")


import functools


@functools.lru_cache(maxsize=1)
def _sweep():
    from dskd_tpu.utils.mmdet_config import (load_mmdet_config,
                                             mmdet_to_experiment)
    got = {}
    records = []
    for d in sorted(os.listdir(REF)):
        dd = os.path.join(REF, d)
        if not os.path.isdir(dd) or d == "_base_":
            continue
        c = collections.Counter()
        for f in sorted(os.listdir(dd)):
            if not f.endswith(".py"):
                continue
            cfg = load_mmdet_config(os.path.join(dd, f))
            if not (cfg.get("model") or {}).get("type"):
                continue
            exp, ignored = mmdet_to_experiment(cfg)
            c[exp.model.arch] += 1
            records.append((d, f, cfg, exp, ignored))
        if c:
            got[d] = dict(sorted(c.items()))
    return got, records


def test_all_reference_configs_route_to_expected_arch():
    got, records = _sweep()
    assert got == EXPECTED, {
        d: (got.get(d), EXPECTED.get(d))
        for d in set(got) | set(EXPECTED)
        if got.get(d) != EXPECTED.get(d)}
    # 605 reference configs total: 601 with a model + 4 model-free bases
    assert sum(sum(v.values()) for v in got.values()) == 601


def test_variant_heads_never_collapse_to_base():
    _, records = _sweep()
    checked = 0
    for d, f, cfg, exp, ignored in records:
        model = cfg.get("model") or {}
        bh = model.get("bbox_head") or {}
        mh = model.get("mask_head") or {}
        for head in (bh, mh):
            t = head.get("type") if isinstance(head, dict) else None
            if t in VARIANT_HEAD_TO_FORBIDDEN:
                assert exp.model.arch != VARIANT_HEAD_TO_FORBIDDEN[t], \
                    (d, f, t, exp.model.arch)
                checked += 1
        roi = model.get("roi_head") or {}
        if isinstance(roi, dict) and roi.get("mask_head") is not None \
                and model.get("type") == "CascadeRCNN":
            assert exp.model.arch == "cascade_mask_rcnn", (d, f)
            checked += 1
    assert checked >= 60   # cascade-mask alone contributes ~40+


def test_dropped_components_are_surfaced():
    """When no dedicated arch exists, the loss must appear in ignored_keys
    (the migrating user's checklist) instead of vanishing silently."""
    _, records = _sweep()
    cases = {
        ("gn+ws", "mask_rcnn_r50_fpn_gn_ws-all_2x_coco.py"): None,
        ("guided_anchoring", "ga_faster_r50_caffe_fpn_1x_coco.py"):
            "GARPNHead",
        ("sabl", "sabl_faster_rcnn_r50_fpn_1x_coco.py"): "SABLHead",
        ("libra_rcnn", "libra_retinanet_r50_fpn_1x_coco.py"): "BFP",
        ("pisa", "pisa_mask_rcnn_r50_fpn_1x_coco.py"): "PISARoIHead",
        ("efficientnet", "retinanet_effb3_fpn_crop896_8x4_1x_coco.py"):
            "RetinaSepBNHead",
    }
    seen = {}
    for d, f, cfg, exp, ignored in records:
        if (d, f) in cases:
            seen[(d, f)] = ignored
    for key, needle in cases.items():
        if needle is None:
            continue
        assert key in seen, key
        assert any(needle in i for i in seen[key]), (key, seen[key])


def test_routed_archs_all_buildable():
    """Every arch the sweep produces is a real family in build_model."""
    import dataclasses

    from dskd_tpu.train.incremental import build_model
    from dskd_tpu.utils.config import ExperimentConfig

    archs = sorted({a for v in EXPECTED.values() for a in v})
    for arch in archs:
        cfg = ExperimentConfig()
        cfg.model = dataclasses.replace(cfg.model, arch=arch,
                                        num_classes=4, depth=18)
        assert build_model(cfg) is not None, arch

"""Family registry: arch -> {build, losses, eval_step, data flags}.

Round-3 review (weak #5): adding a model family meant hand-editing three
monoliths in sync — ``train/incremental.py build_model``,
``train/family.py make_family_train_step``, ``eval/evaluator.py
make_eval_step`` — plus the with_mask/with_semantic tuples. This
registry replaces the mmdet DETECTORS registry role (reference
mmdet/models/builder.py:59) the TPU-idiomatic way: a family's module
registers one spec carrying the whole triple, and the three dispatchers
are thin registry lookups. Adding a family touches the family's own
module + the ``_LAZY`` row + a config; ``tests/test_configs.py`` picks
it up automatically.

Spec keys:
  build(cfg: ExperimentConfig) -> flax module
  losses(model, cfg, *, num_prev, has_teacher, use_l1, use_dropout,
         **_) -> losses_fn(variables, batch, teacher_vars, rng)
          -> (losses dict, new_batch_stats | None)
  train_step(model, cfg, *, num_prev, has_teacher, use_dropout,
         compute_dtype, use_l1, **_) -> jitted step — families that
      build their own full step (the DSKD flagship's donation +
      teacher-outside-vjp layout) register this INSTEAD of ``losses``.
  eval_step(model, *, score_thr, max_per_img, reg_max, **_) -> jitted
      (variables, images, img_hw, scale_factors) -> detections
  init_all: bool — init must trace the ROI head(s) too
      (model.init(..., method=init_all); two-stage families).
  with_mask / with_semantic: bool — the data pipeline must supply GT
      bitmaps / semantic maps (consulted by the driver and tests).
"""
from __future__ import annotations

import importlib
from typing import Any, Dict, Optional

_REGISTRY: Dict[str, Dict[str, Any]] = {}

# arch -> module that registers it on import (lazy: the registry must be
# importable without pulling every family's jax graph code)
_LAZY = {
    "gfl_deformable_detr": "dskd_tpu.models.detector",
    "deformable_detr_il": "dskd_tpu.models.detector",
    "deformable_detr": "dskd_tpu.models.deformable_detr",
    "detr": "dskd_tpu.models.detr",
    "yolof": "dskd_tpu.models.yolof",
    "yoloy": "dskd_tpu.models.yoloy",
    "yolox": "dskd_tpu.models.yolox",
    "gfl": "dskd_tpu.models.gfl",
    "ld": "dskd_tpu.models.ld",
    "faster_rcnn": "dskd_tpu.models.faster_rcnn",
    "libra_faster_rcnn": "dskd_tpu.models.faster_rcnn",
    "double_head_rcnn": "dskd_tpu.models.faster_rcnn",
    "carafe_faster_rcnn": "dskd_tpu.models.faster_rcnn",
    "pisa_faster_rcnn": "dskd_tpu.models.faster_rcnn",
    "dynamic_rcnn": "dskd_tpu.models.faster_rcnn",
    "faster_rcnn_gn_ws": "dskd_tpu.models.faster_rcnn",
    "faster_rcnn_gn": "dskd_tpu.models.faster_rcnn",
    "faster_rcnn_pafpn": "dskd_tpu.models.faster_rcnn",
    "fast_rcnn": "dskd_tpu.models.faster_rcnn",
    "rpn": "dskd_tpu.models.faster_rcnn",
    "ga_rpn": "dskd_tpu.models.guided_anchor",
    "ga_retina": "dskd_tpu.models.guided_anchor",
    "cascade_rpn": "dskd_tpu.models.cascade_rpn_head",
    "retinanet": "dskd_tpu.models.retinanet",
    "pisa_retinanet": "dskd_tpu.models.retinanet",
    "retinanet_ghm": "dskd_tpu.models.retinanet",
    "retinanet_fpg": "dskd_tpu.models.retinanet",
    "retinanet_nasfpn": "dskd_tpu.models.retinanet",
    "free_anchor": "dskd_tpu.models.free_anchor",
    "fcos": "dskd_tpu.models.fcos",
    "nasfcos": "dskd_tpu.models.fcos",
    "cascade_rcnn": "dskd_tpu.models.cascade_rcnn",
    "detectors_cascade_rcnn": "dskd_tpu.models.cascade_rcnn",
    "cascade_mask_rcnn": "dskd_tpu.models.cascade_mask_rcnn",
    "htc": "dskd_tpu.models.htc",
    "scnet": "dskd_tpu.models.scnet",
    "point_rend": "dskd_tpu.models.point_rend",
    "grid_rcnn": "dskd_tpu.models.grid_rcnn",
    "tridentnet": "dskd_tpu.models.trident",
    "sparse_rcnn": "dskd_tpu.models.sparse_rcnn",
    "queryinst": "dskd_tpu.models.queryinst",
    "mask_rcnn": "dskd_tpu.models.mask_rcnn",
    "mask_rcnn_seesaw": "dskd_tpu.models.mask_rcnn",
    "ms_rcnn": "dskd_tpu.models.ms_rcnn",
    "panoptic_fpn": "dskd_tpu.models.panoptic_fpn",
    "maskformer": "dskd_tpu.models.maskformer",
    "mask2former": "dskd_tpu.models.mask2former",
    "solo": "dskd_tpu.models.solo",
    "decoupled_solo": "dskd_tpu.models.solo",
    "decoupled_solo_light": "dskd_tpu.models.solo",
    "yolact": "dskd_tpu.models.yolact",
    "centernet": "dskd_tpu.models.centernet",
    "ssd": "dskd_tpu.models.ssd",
    "pisa_ssd": "dskd_tpu.models.ssd",
    "yolov3": "dskd_tpu.models.yolov3",
    "atss": "dskd_tpu.models.atss",
    "vfnet": "dskd_tpu.models.vfnet",
    "tood": "dskd_tpu.models.tood",
    "foveabox": "dskd_tpu.models.foveabox",
    "fsaf": "dskd_tpu.models.fsaf",
    "reppoints": "dskd_tpu.models.reppoints",
    "autoassign": "dskd_tpu.models.autoassign",
    "paa": "dskd_tpu.models.paa",
    "lad": "dskd_tpu.models.paa",
    "sabl_retina": "dskd_tpu.models.sabl_retina",
    "centripetalnet": "dskd_tpu.models.centripetal",
    "cornernet": "dskd_tpu.models.cornernet",
}


def register_family(name: str, *, build, losses=None, eval_step=None,
                    train_step=None, init_all: bool = False,
                    with_mask: bool = False,
                    with_semantic: bool = False) -> None:
    _REGISTRY[name] = dict(build=build, losses=losses, eval_step=eval_step,
                           train_step=train_step, init_all=init_all,
                           with_mask=with_mask, with_semantic=with_semantic)


def get_family(name: str) -> Optional[Dict[str, Any]]:
    if name not in _REGISTRY and name in _LAZY:
        importlib.import_module(_LAZY[name])
    return _REGISTRY.get(name)


def family_flag(name: str, flag: str) -> bool:
    spec = get_family(name)
    return bool(spec and spec.get(flag))


def family_data_flag(name: str, flag: str, cfg) -> bool:
    """Config-aware data flag: a spec may set with_semantic="panoptic"
    (maskformer/mask2former need semantic GT only under the panoptic
    recipe)."""
    spec = get_family(name)
    v = spec.get(flag) if spec else False
    if v == "panoptic":
        return bool(cfg.model.panoptic)
    return bool(v)


def teacher_model(model, cfg):
    """The frozen teacher's module for KD families: the student's module
    unless ``model.teacher_depth`` differs (r18 student <- r101 teacher,
    configs/ld + configs/lad; reference kd_one_stage.py/lad.py build the
    teacher from its own config file)."""
    td = cfg.model.teacher_depth
    if not td or td == cfg.model.depth:
        return model
    from .train.incremental import build_teacher_model
    return build_teacher_model(cfg)

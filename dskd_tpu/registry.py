"""Family registry: arch -> {build, losses, eval_step, data flags}.

Round-3 review (weak #5): adding a model family meant hand-editing three
monoliths in sync — ``train/incremental.py build_model``,
``train/family.py make_family_train_step``, ``eval/evaluator.py
make_eval_step`` — plus the with_mask/with_semantic tuples (the
convention CLAUDE.md documents). This registry replaces the mmdet
DETECTORS registry role (reference mmdet/models/builder.py) the
TPU-idiomatic way: a family's module registers one spec carrying the
whole triple, and the three dispatchers consult the registry FIRST,
falling back to their legacy chains. Adding a family now touches the
family's own module + a config; ``tests/test_configs.py`` picks it up
automatically.

Spec keys:
  build(cfg: ExperimentConfig) -> flax module
  losses(model, cfg, *, num_prev, has_teacher, use_l1) ->
      losses_fn(variables, batch, teacher_vars, rng)
          -> (losses dict, new_batch_stats | None)
  eval_step(model, *, score_thr, max_per_img) -> jitted
      (variables, images, img_hw, scale_factors) -> detections
  with_mask / with_semantic: bool — the data pipeline must supply GT
      bitmaps / semantic maps (consulted by the driver and tests).

``decoupled_solo`` / ``decoupled_solo_light`` (models/solo.py) are the
reference registrations.
"""
from __future__ import annotations

import importlib
from typing import Any, Dict, Optional

_REGISTRY: Dict[str, Dict[str, Any]] = {}

# arch -> module that registers it on import (lazy: the registry must be
# importable without pulling every family's jax graph code)
_LAZY = {
    "decoupled_solo": "dskd_tpu.models.solo",
    "decoupled_solo_light": "dskd_tpu.models.solo",
}


def register_family(name: str, *, build, losses=None, eval_step=None,
                    with_mask: bool = False,
                    with_semantic: bool = False) -> None:
    _REGISTRY[name] = dict(build=build, losses=losses, eval_step=eval_step,
                           with_mask=with_mask, with_semantic=with_semantic)


def get_family(name: str) -> Optional[Dict[str, Any]]:
    if name not in _REGISTRY and name in _LAZY:
        importlib.import_module(_LAZY[name])
    return _REGISTRY.get(name)


def family_flag(name: str, flag: str) -> bool:
    spec = get_family(name)
    return bool(spec and spec.get(flag))

"""Optimizer construction (parity: mmcv build_optimizer + OptimizerHook).

Flagship recipe (configs/deformable_detr/chaosuan_*_il.py:218-236): AdamW
lr=2e-4-class, weight_decay=1e-4, paramwise lr_mult 0.1 for 'backbone',
'sampling_offsets' and 'reference_points' params, global grad clip
max_norm=0.1.

Freeze semantics (reference resnet.py:613-652 + norm_cfg requires_grad=False):
stem + stage1 params and ALL backbone BatchNorm affine params receive no
updates. Forward-side stop_gradients already zero most of these; the
optimizer additionally masks them so AdamW's weight decay cannot drift them.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import optax


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def default_param_labels(frozen_stages: int = 1) -> Callable:
    """Label each param: 'frozen' | 'lr01' (0.1x lr) | 'base'."""

    def label(path, _leaf):
        p = _path_str(path)
        if p.startswith("backbone"):
            if "stem_" in p:
                return "frozen" if frozen_stages >= 0 else "lr01"
            for stage in range(1, frozen_stages + 1):
                if f"layer{stage}_" in p:
                    return "frozen"
            # frozen BN affine everywhere in the backbone (norm requires_grad=False)
            if p.endswith("/scale") or p.endswith("/bias"):
                if "bn" in p or "downsample_bn" in p:
                    return "frozen"
            return "lr01"
        if "sampling_offsets" in p or "reference_points" in p:
            return "lr01"
        return "base"

    return label


def make_optimizer(params: Any, lr_schedule: Callable,
                   weight_decay: float = 1e-4, max_norm: float = 0.1,
                   frozen_stages: int = 1,
                   label_fn: Callable = None) -> optax.GradientTransformation:
    """AdamW with per-group lr multipliers, freeze mask, and grad clipping."""
    label_fn = label_fn or default_param_labels(frozen_stages)
    labels = jax.tree_util.tree_map_with_path(label_fn, params)

    def adamw(mult):
        return optax.adamw(lambda s: lr_schedule(s) * mult,
                           weight_decay=weight_decay)

    tx = optax.multi_transform(
        {"base": adamw(1.0), "lr01": adamw(0.1),
         "frozen": optax.set_to_zero()},
        labels)
    return optax.chain(optax.clip_by_global_norm(max_norm), tx)

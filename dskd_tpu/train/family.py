"""Per-family train-step construction: a thin dispatch over the family
registry (dskd_tpu/registry.py — the mmdet DETECTORS-registry analog,
reference mmdet/models/builder.py:59).

Every family's losses_fn / train_step factory lives in the family's own
model module (`register_family(..., losses=..., train_step=...)`); this
module only owns the shared step wrapper (`_jit_family_step`) that turns
a losses_fn into the jitted, donating (state, batch, teacher_vars) ->
(state, losses) step every driver consumes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.config import ExperimentConfig
from .state import TrainState
from .step import Batch, parse_losses  # noqa: F401  (Batch re-export)


def make_family_train_step(arch: str, model, cfg: ExperimentConfig,
                           num_prev: int, has_teacher: bool,
                           use_dropout: bool = True,
                           compute_dtype=jnp.float32,
                           use_l1: bool = False):
    """Returns a jitted (state, batch, teacher_vars) -> (state, losses).

    ``use_l1`` is YOLOX's ModeSwitch extra: the driver rebuilds the step
    with it on when the no-aug phase starts (detectors/yolox.py +
    YOLOXModeSwitchHook)."""
    from ..registry import get_family
    spec = get_family(arch)
    if spec is None:
        raise ValueError(f"no train step for arch: {arch}")
    if spec.get("train_step") is not None:
        return spec["train_step"](
            model, cfg, num_prev=num_prev, has_teacher=has_teacher,
            use_dropout=use_dropout, compute_dtype=compute_dtype,
            use_l1=use_l1)
    return _jit_family_step(spec["losses"](
        model, cfg, num_prev=num_prev, has_teacher=has_teacher,
        use_l1=use_l1, use_dropout=use_dropout))


def _jit_family_step(losses_fn):
    """Common tail: wrap a family losses_fn into the jitted, donating
    (state, batch, teacher_vars) -> (state, losses) train step."""

    def train_step(state: TrainState, batch: Batch, teacher_vars=None):
        rng, step_rng = jax.random.split(state.rng)

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats}
            losses, new_bs = losses_fn(variables, batch, teacher_vars,
                                       step_rng)
            return parse_losses(losses), (losses, new_bs)

        (total, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads).replace(rng=rng)
        if new_bs is not None:
            new_state = new_state.replace(batch_stats=new_bs)
        losses = dict(losses)
        losses["loss"] = total
        return new_state, losses

    return jax.jit(train_step, donate_argnums=(0,))

"""LR schedules (parity: mmcv StepLrUpdaterHook with linear warmup).

Flagship recipe (configs/deformable_detr/chaosuan_*_il.py:228-236): linear
warmup over 1500 iters from ratio 0.01, step decay x0.1 at epochs [8, 11],
12 epochs per task.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def step_lr_schedule(base_lr: float, warmup_iters: int = 1500,
                     warmup_ratio: float = 0.01,
                     step_epochs: Sequence[int] = (8, 11),
                     iters_per_epoch: int = 1000, gamma: float = 0.1):
    """Returns f(step) -> lr matching mmcv's step policy + linear warmup."""
    steps = jnp.asarray([e * iters_per_epoch for e in step_epochs])

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        decays = (step >= steps).sum()
        lr = base_lr * gamma ** decays
        # mmcv linear warmup: factor from warmup_ratio -> 1 over warmup_iters
        k = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        factor = warmup_ratio + (1.0 - warmup_ratio) * k
        return jnp.where(step < warmup_iters, lr * factor, lr)

    return schedule


def yolox_cosine_schedule(base_lr: float, warmup_iters: int,
                          total_iters: int, last_iters: int = 0,
                          min_lr_ratio: float = 0.05):
    """YOLOXLrUpdaterHook (mmcv lr_updater.py quarter-cosine policy):
    quadratic warmup ``lr * (step / warmup)**2``, cosine anneal from the
    warmup end to ``total - last_iters``, then a fixed floor of
    ``min_lr_ratio * base_lr`` for the final no-aug epochs."""
    min_lr = base_lr * min_lr_ratio
    anneal = max(total_iters - last_iters - warmup_iters, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        w = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        k = jnp.clip((step - warmup_iters) / anneal, 0.0, 1.0)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(jnp.pi * k))
        return jnp.where(step < warmup_iters, base_lr * w * w, cos)

    return schedule

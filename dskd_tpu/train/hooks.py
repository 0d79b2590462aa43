"""Training-time behaviors (parity: mmdet/core/hook + the IL detector's
distributed-correctness checks).

  * check_invalid_loss — CheckInvalidLossHook (checkloss_hook.py:21-24):
    assert every loss is finite every N iters.
  * assert_loss_keys_consistent — the cross-rank loss-key consistency check
    (deformable_detr_il.py:236-243): divergent control flow across hosts
    shows up as differing loss dicts; with statically-configured distill
    branches this can only fire on programming errors, but it is kept as a
    cheap distributed-correctness tripwire (hash of the sorted key string
    all-gathered across processes).
  * ExpMomentumEMA — core/hook/ema.py: exponential-momentum parameter
    averaging as a pure pytree update.

Hooks that are structurally unnecessary here (documented so the parity
audit does not read them as gaps):
  * SyncNormHook (core/hook/sync_norm_hook.py:52) all-reduces BN buffers
    across ranks before eval. Under GSPMD the batch-stat reduction inside
    the jitted step already spans the GLOBAL (mesh-sharded) batch, so every
    host holds identical stats by construction — there is nothing to sync.
  * SyncRandomSizeHook (sync_random_size_hook.py:72) broadcasts the random
    train resolution so DDP ranks agree on tensor shapes. Multi-scale here
    resizes onto a STATIC bucket canvas (pipeline.py), so shapes cannot
    diverge across hosts; per-image scale choice needs no coordination.
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def check_invalid_loss(losses: Dict[str, jnp.ndarray], step: int,
                       interval: int = 50):
    """Raise if any loss is non-finite (call on host values)."""
    if interval and step % interval != 0:
        return
    for k, v in losses.items():
        v = float(v)
        if not math.isfinite(v):
            raise FloatingPointError(f"loss '{k}' became {v} at step {step}")


def assert_loss_keys_consistent(losses: Dict[str, jnp.ndarray]):
    """Cross-host agreement on the loss-dict key set (multi-process only)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    key_hash = np.float32(hash("|".join(sorted(losses))) % (2 ** 31))
    gathered = multihost_utils.process_allgather(key_hash)
    if not np.all(gathered == gathered[0]):
        raise RuntimeError(
            "loss dict keys differ across hosts — divergent control flow")


def ema_update(ema_params, params, step, momentum: float = 0.0002,
               total_iter: int = 2000):
    """ExpMomentumEMA: momentum decays from 1 to `momentum` over warmup.

    ema <- (1 - m) * ema + m * params, with
    m = (1 - momentum) * exp(-(step + 1) / total_iter) + momentum.
    """
    m = (1 - momentum) * jnp.exp(-(step + 1.0) / total_iter) + momentum
    return jax.tree.map(
        lambda e, p: e * (1 - m) + p * m if jnp.issubdtype(
            e.dtype, jnp.floating) else p,
        ema_params, params)

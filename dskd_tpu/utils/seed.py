"""Random-seed utilities (parity: mmdet/apis/train.py init_random_seed /
set_random_seed + core/utils/dist_utils.py sync_random_seed).

The reference broadcasts a rank-0 random seed over NCCL so all workers
shuffle identically; here the seed is folded into one jax PRNG key and
agreed across hosts with a process_allgather (DCN), and numpy's global
state is seeded for the host-side data pipeline.
"""
from __future__ import annotations

import random
from typing import Optional

import jax
import numpy as np


def init_random_seed(seed: Optional[int] = None) -> int:
    """Choose a seed (host 0's randomness wins across processes)."""
    if seed is None:
        seed = int(np.random.randint(0, 2 ** 31 - 1))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        arr = multihost_utils.broadcast_one_to_all(
            np.asarray(seed, np.int32))
        seed = int(arr)
    return seed


def set_random_seed(seed: int):
    """Seed host-side RNGs; returns the jax PRNG key for device-side use.

    (The reference additionally flips cudnn-deterministic switches; XLA
    compilation is deterministic by construction.)"""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)

"""Device mesh + sharding helpers (the reference's §2.7 TPU equivalent).

The reference scales out with one process per GPU + NCCL DDP ring-allreduce
(tools/train_increment.py:299-304). Here: ONE ``jax.sharding.Mesh`` over all
chips with a ``data`` axis; params replicated, the batch sharded on its
leading axis. Under jit, XLA GSPMD inserts the gradient all-reduce over ICI
and every global reduction in the loss (positive counts, avg factors) is
automatically the cross-replica value — the reference needed explicit
``reduce_mean`` calls inside the loss for that (core/utils/dist_utils.py:68).

``find_unused_parameters=True`` (needed by DDP because distill branches are
conditional) has no analog: distill branches are statically configured into
the one compiled step.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Shard every array's leading (batch) axis across the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / optimizer state / teacher)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host bring-up (replaces init_dist + seed broadcast).

    On Cloud TPU pods jax.distributed.initialize() autodetects everything;
    arguments are for manual launches.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()

"""Tensor parallelism over a 2D (data, model) mesh via GSPMD sharding.

The reference scales only by data parallelism (SURVEY §2.7 — TP/PP/SP all
absent), which caps the trainable model size at one GPU's memory. The
TPU-native framework gets TP for free from GSPMD: annotate the transformer
params with Megatron-style partition specs over a ``model`` mesh axis and
jit — XLA places the all-reduces on ICI.

Pattern (Megatron): column-parallel first projection (output dim sharded),
row-parallel second projection (input dim sharded) so each FFN/attention
block needs one all-reduce:

  * MSDeformAttention ``value_proj`` kernel (C, H*D) -> shard heads (cols);
    ``output_proj`` kernel (H*D, C) -> shard rows. Per-head sampling in
    ms_deform_attn_core then stays local to each model shard.
  * FFN ``fc1`` (C, F) -> cols; ``fc2`` (F, C) -> rows.
  * flax MultiHeadDotProductAttention (decoder self-attention)
    query/key/value kernels (C, H, D) -> shard the head axis;
    out kernel (H, D, C) -> shard the head axis.
  * everything else (norms, cls/reg branches, backbone) replicated.
"""
from __future__ import annotations

import re
from typing import Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DEFAULT_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*/value_proj/kernel$", P(None, "model")),
    (r".*/value_proj/bias$", P("model")),
    (r".*/output_proj/kernel$", P("model", None)),
    (r".*/ffn/fc1/kernel$", P(None, "model")),
    (r".*/ffn/fc1/bias$", P("model")),
    (r".*/ffn/fc2/kernel$", P("model", None)),
    (r".*/(query|key|value)/kernel$", P(None, "model", None)),
    (r".*/(query|key|value)/bias$", P("model", None)),
    (r".*/out/kernel$", P("model", None, None)),
)


def make_2d_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_model, (len(devices), n_data, n_model)
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def _path_str(path) -> str:
    return "/".join(getattr(k, "key", str(k)) for k in path)


def tp_pspecs(params, rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES):
    """PartitionSpec pytree for ``params``: first matching rule, else
    replicated. A rule whose spec rank mismatches the leaf is an error —
    it means the rule pattern caught the wrong parameter."""
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def spec_for(path, leaf):
        s = _path_str(path)
        for pat, spec in compiled:
            if pat.match(s):
                assert len(spec) <= leaf.ndim, (s, spec, leaf.shape)
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_tree(tree, mesh: Mesh, pspecs):
    """device_put every leaf with its NamedSharding."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        tree, pspecs, is_leaf=lambda x: x is None)


def shard_state_tp(state, mesh: Mesh,
                   rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES):
    """Shard a TrainState: params by the TP rules, AdamW moments like the
    param of the same shape, scalars/counters/batch-stats replicated.

    Matching optimizer moments to params by SHAPE is a heuristic (moments
    are param-shaped pytrees inside optax state with differing structure);
    a shape collision only means a moment gets a different-but-valid
    sharding — GSPMD stays correct, at worst with an extra reshard.
    """
    pspecs = tp_pspecs(state.params, rules)
    replicated = NamedSharding(mesh, P())

    shape_to_spec = {}
    for leaf, spec in zip(
            jax.tree.leaves(state.params),
            jax.tree.leaves(pspecs, is_leaf=lambda x: isinstance(x, P))):
        shape_to_spec.setdefault(leaf.shape, spec)

    def shard_opt_leaf(x):
        spec = shape_to_spec.get(getattr(x, "shape", None), P())
        return jax.device_put(x, NamedSharding(mesh, spec))

    return state.replace(
        params=shard_tree(state.params, mesh, pspecs),
        opt_state=jax.tree.map(shard_opt_leaf, state.opt_state),
        batch_stats=jax.tree.map(
            lambda x: jax.device_put(x, replicated), state.batch_stats),
        rng=jax.device_put(state.rng, replicated),
        step=jax.device_put(state.step, replicated))

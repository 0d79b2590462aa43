"""Fused MSDA sampling: one one-hot MXU contraction per level.

Replaces, for small levels, the THREE-stage XLA formulation
(_pack_corners data movement -> row gather -> corner-weight reduce) with a
single Pallas kernel: per query tile, build a combined one-hot row with
FOUR WEIGHTED NONZEROS per sampling point (the bilinear corners
c00/c00+1/c00+w/c00+w+1, each scaled by its corner weight x attention
weight) against the UNPACKED (S_raw, D) level table, then one MXU matmul
emits the fully-accumulated per-query output. No packed-corner tables, no
post-gather weighting; out-of-range corner indices carry zero weight and
simply never match the iota (grid_sample zero padding for free).

Backward: d_table is the transposed contraction; d_weights re-derives the
per-corner taps from (g @ table^T) with the same iota compares.

FLOP note: rows shrink from Q*P (packed formulation) to Q, so the MXU work
drops ~4x even though the 32-lane output pads to 128 lanes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(P, W, S, idx_ref, w_ref, table_ref, out_ref):
    tq = idx_ref.shape[1]
    combined = jnp.zeros((tq, S), jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tq, S), 1)
    for p in range(P):
        base = idx_ref[0, :, p][:, None]                   # (TQ, 1)
        for c, off in enumerate((0, 1, W, W + 1)):
            # weights arrive f32: Mosaic cannot insert a minor dim on
            # sub-32-bit types ("Insertion of minor dim ... 32-bit")
            wgt = w_ref[0, :, p, c][:, None]
            combined += jnp.where(cols == base + off, wgt, 0.0)
    out_ref[0] = jnp.dot(combined, table_ref[0].astype(jnp.float32),
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


def _bwd_kernel(P, W, S, idx_ref, w_ref, g_ref, table_ref,
                dtable_ref, dw_ref):
    t = pl.program_id(1)
    tq = idx_ref.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tq, S), 1)
    combined = jnp.zeros((tq, S), jnp.float32)
    for p in range(P):
        base = idx_ref[0, :, p][:, None]
        for c, off in enumerate((0, 1, W, W + 1)):
            wgt = w_ref[0, :, p, c][:, None]
            combined += jnp.where(cols == base + off, wgt, 0.0)
    g = g_ref[0].astype(jnp.float32)                       # (TQ, D)
    table = table_ref[0].astype(jnp.float32)               # (S, D)

    @pl.when(t == 0)
    def _():
        dtable_ref[0] = jnp.zeros_like(dtable_ref[0])

    dtable_ref[0] += jnp.dot(combined.T, g,
                             preferred_element_type=jnp.float32
                             ).astype(dtable_ref.dtype)

    m = jnp.dot(g, table.T, preferred_element_type=jnp.float32)  # (TQ, S)
    for p in range(P):
        base = idx_ref[0, :, p][:, None]
        for c, off in enumerate((0, 1, W, W + 1)):
            tap = jnp.where(cols == base + off, m, 0.0).sum(axis=1)
            dw_ref[0, :, p, c] = tap.astype(dw_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_msda_sample(table: jnp.ndarray, idx: jnp.ndarray,
                      weights: jnp.ndarray, level_w: int,
                      tile_q: int = 128) -> jnp.ndarray:
    """out[b, q] = sum_{p, c} weights[b, q, p, c] * table[b, idx[b,q,p]+off_c].

    table: (B, S, D); idx: (B, Q, P) int32 (c00 flat index; out-of-range
    corners MUST carry zero weight); weights: (B, Q, P, 4) FLOAT32 (the
    kernel reads scalar-indexed minor dims, unsupported on 16-bit);
    level_w: the level's row width (corner offsets 0/1/W/W+1).
    Returns (B, Q, D) in table.dtype. Q % tile_q == 0.
    """
    return _fs_fwd(table, idx, weights, level_w, tile_q)[0]


def _fs_fwd(table, idx, weights, level_w, tile_q):
    B, S, D = table.shape
    Q, P = idx.shape[1], idx.shape[2]
    kern = functools.partial(_fwd_kernel, P, level_w, S)
    out = pl.pallas_call(
        kern,
        grid=(B, Q // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, P), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, P, 4), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, D), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Q, D), table.dtype),
    )(idx, weights, table)
    return out, (table, idx, weights)


def _fs_bwd(level_w, tile_q, res, g):
    table, idx, weights = res
    B, S, D = table.shape
    Q, P = idx.shape[1], idx.shape[2]
    kern = functools.partial(_bwd_kernel, P, level_w, S)
    dtable, dw = pl.pallas_call(
        kern,
        grid=(B, Q // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, P), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, P, 4), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, D), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, S, D), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, P, 4), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, D), table.dtype),
            jax.ShapeDtypeStruct((B, Q, P, 4), weights.dtype),
        ],
    )(idx, weights, g.astype(table.dtype), table)
    return dtable, None, dw


fused_msda_sample.defvjp(_fs_fwd, _fs_bwd)

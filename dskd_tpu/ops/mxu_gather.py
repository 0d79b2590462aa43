"""MXU one-hot row gather: a Pallas kernel replacing XLA's scalar-loop
TPU gather for small tables.

Motivation (PERF.md): XLA lowers row gathers to a ~8-cycle-per-row scalar
loop (~30 GB/s), which makes MS-deformable-attention sampling the dominant
cost of the whole DSKD step. For tables small enough to sit in VMEM, the
gather out[m] = table[idx[m]] is expressible as onehot(idx) @ table — the
one-hot tile is built on the VPU in VMEM (never touching HBM) and the
contraction runs on the MXU at matmul speed. The VJP is another matmul
(onehot^T @ g), replacing the even-slower backward scatter-add.

Cost: 2*M*S*D flops per (batch) — worthwhile when S (table rows) is small;
the caller picks a cutoff (dskd MSDA: FPN levels with S' <= ~2100).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(idx_ref, table_ref, out_ref):
    tm = idx_ref.shape[1]
    s = table_ref.shape[1]
    idx = idx_ref[0]                                   # (TM, 1) int32
    cols = jax.lax.broadcasted_iota(jnp.int32, (tm, s), 1)
    onehot = (cols == idx).astype(table_ref.dtype)     # (TM, S)
    out_ref[0] = jnp.dot(onehot, table_ref[0],
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


def _bwd_kernel(idx_ref, g_ref, dtable_ref):
    tm = idx_ref.shape[1]
    s = dtable_ref.shape[1]
    mi = pl.program_id(1)
    idx = idx_ref[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tm, s), 1)
    onehot = (cols == idx).astype(g_ref.dtype)         # (TM, S)
    contrib = jnp.dot(onehot.T, g_ref[0],
                      preferred_element_type=jnp.float32
                      ).astype(dtable_ref.dtype)

    @pl.when(mi == 0)
    def _():
        dtable_ref[0] = jnp.zeros_like(dtable_ref[0])

    dtable_ref[0] += contrib


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def mxu_gather(table: jnp.ndarray, idx: jnp.ndarray,
               tile_m: int = 512) -> jnp.ndarray:
    """out[b, m] = table[b, idx[b, m]].

    table: (B, S, D) with D a multiple of 128 and S*D*2 bytes well under
    VMEM. idx: (B, M) int32 in [0, S). Returns (B, M, D).
    """
    return _mxu_gather_fwd(table, idx, tile_m)[0]


def _mxu_gather_fwd(table, idx, tile_m):
    B, S, D = table.shape
    M = idx.shape[1]
    Mp = _round_up(M, tile_m)
    idx_p = jnp.pad(idx, ((0, 0), (0, Mp - M)))
    grid = (B, Mp // tile_m)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_m, 1), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_m, D), lambda b, m: (b, m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Mp, D), table.dtype),
    )(idx_p[..., None], table)
    return out[:, :M], (table, idx)


def _mxu_gather_bwd(tile_m, res, g):
    table, idx = res
    B, S, D = table.shape
    M = idx.shape[1]
    Mp = _round_up(M, tile_m)
    idx_p = jnp.pad(idx, ((0, 0), (0, Mp - M)), constant_values=S + 1)
    g_p = jnp.pad(g.astype(table.dtype), ((0, 0), (0, Mp - M), (0, 0)))
    grid = (B, Mp // tile_m)
    dtable = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_m, 1), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, D), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, D), lambda b, m: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, D), table.dtype),
    )(idx_p[..., None], g_p)
    return dtable, None


mxu_gather.defvjp(_mxu_gather_fwd, _mxu_gather_bwd)

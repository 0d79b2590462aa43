"""Windowed MXU gather for the encoder's level-0 MSDA sampling.

The level-0 packed-corner table (~6.7k rows at 640x640) is too large for
the full one-hot MXU gather (ops/mxu_gather.py) — the one-hot flops grow
with table rows and dominate past ~2.5k rows (PERF.md). But the encoder's
level-0 QUERIES are the level-0 pixels in raster order, and each query's
sampling locations cluster around its own position (reference point =
own pixel; learned offsets are bounded in practice). So per tile of TM
consecutive queries, all sampled rows fall inside a STATIC window of K
table rows centered on the tile's image row — and a (TM*P, K) one-hot
contraction against the window runs on the MXU at matmul speed.

Exactness: window coverage is data-dependent (offsets are learned), so the
caller computes ``in_window`` and lax.cond's to the XLA gather when ANY
sample escapes (ms_deform_attn_core). The kernel itself zero-masks
out-of-window rows, so the cond guard is the only correctness dependency.

The backward is the transposed contraction accumulated into the window
(a matmul instead of XLA's scalar-loop scatter-add).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# dynamic-slice starts into a (sublane, 128)-tiled VMEM table must be
# sublane-aligned or Mosaic refuses to vector.load ("cannot statically
# prove that index ... is a multiple of 8"); 16 covers bf16's (16, 128)
# native tile too
SUBLANE_ALIGN = 16


def tile_window_starts(n_queries: int, tile_q: int, w: int, w_pad: int,
                       s_pad: int, window: int) -> Tuple[int, ...]:
    """Static window start row per query tile.

    Queries are raster-ordered level-0 pixels of an (h, w) map; the packed
    table has w_pad = w + 2 columns per image row and s_pad rows total.
    The window for tile t is centered on the tile's middle image row, then
    aligned down to SUBLANE_ALIGN (the kernel asserts the same multiple via
    pl.multiple_of — the in_window cond fallback keeps exactness either way).
    """
    starts = []
    n_tiles = n_queries // tile_q
    for t in range(n_tiles):
        mid_q = t * tile_q + tile_q // 2
        row = mid_q // w + 1                       # +1: padded-grid offset
        center = row * w_pad + w_pad // 2
        ws = int(np.clip(center - window // 2, 0, max(s_pad - window, 0)))
        starts.append(ws - ws % SUBLANE_ALIGN)
    return tuple(starts)


def _make_kernels(K: int):
    def fwd_kernel(starts_ref, idx_ref, table_ref, out_ref):
        t = pl.program_id(1)
        ws = pl.multiple_of(starts_ref[t], SUBLANE_ALIGN)
        tmp = idx_ref.shape[1]
        window = table_ref[0, pl.ds(ws, K), :]              # (K, D)
        local = idx_ref[0] - ws                             # (TMP, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tmp, K), 1)
        onehot = ((cols == local) & (local >= 0)
                  & (local < K)).astype(table_ref.dtype)
        out_ref[0] = jnp.dot(onehot, window,
                             preferred_element_type=jnp.float32
                             ).astype(out_ref.dtype)

    def bwd_kernel(starts_ref, idx_ref, g_ref, dtable_ref):
        t = pl.program_id(1)
        ws = pl.multiple_of(starts_ref[t], SUBLANE_ALIGN)
        tmp = idx_ref.shape[1]
        local = idx_ref[0] - ws
        cols = jax.lax.broadcasted_iota(jnp.int32, (tmp, K), 1)
        onehot = ((cols == local) & (local >= 0)
                  & (local < K)).astype(g_ref.dtype)
        contrib = jnp.dot(onehot.T, g_ref[0],
                          preferred_element_type=jnp.float32
                          ).astype(dtable_ref.dtype)

        @pl.when(t == 0)
        def _():
            dtable_ref[0] = jnp.zeros_like(dtable_ref[0])

        dtable_ref[0, pl.ds(ws, K), :] += contrib

    return fwd_kernel, bwd_kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def window_gather(table: jnp.ndarray, idx: jnp.ndarray,
                  starts: jnp.ndarray, tile_rows: int,
                  window: int) -> jnp.ndarray:
    """out[b, t*tile_rows + r] = table[b, idx[b, t*tile_rows + r]] when the
    index lies in [starts[t], starts[t] + window); ZERO otherwise (the
    caller guarantees coverage via a cond fallback).

    table: (B, S, D) with D % 128 == 0; idx: (B, M) int32 with
    M % tile_rows == 0; starts: (n_tiles,) int32 window start per tile.
    """
    return _wg_fwd(table, idx, starts, tile_rows, window)[0]


def _wg_fwd(table, idx, starts, tile_rows, window):
    B, S, D = table.shape
    M = idx.shape[1]
    n_tiles = M // tile_rows
    fwd_kernel, _ = _make_kernels(window)
    out = pl.pallas_call(
        fwd_kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_rows, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_rows, D), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, D), table.dtype),
    )(starts, idx[..., None], table)
    return out, (table, idx, starts)


def _wg_bwd(tile_rows, window, res, g):
    table, idx, starts = res
    B, S, D = table.shape
    M = idx.shape[1]
    n_tiles = M // tile_rows
    _, bwd_kernel = _make_kernels(window)
    dtable = pl.pallas_call(
        bwd_kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_rows, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_rows, D), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, D), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, D), table.dtype),
    )(starts, idx[..., None], g.astype(table.dtype))
    return dtable, None, None


window_gather.defvjp(_wg_fwd, _wg_bwd)

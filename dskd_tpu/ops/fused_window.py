"""Fused windowed MXU sampling for the encoder's level-0 MSDA gather.

Combines the two round-2 kernels that each lost on their own:
  * ops/window_gather.py proved the windowed one-hot CONTRACTION runs at
    matmul speed, but materializing its (B, H, n0, P, 4, D) gather output
    cost ~5G of HBM round-trips and measured slower end-to-end;
  * ops/fused_sample.py proved corner weighting + point reduction fuse
    into the kernel, but its full-table one-hot only pays for small levels.

This kernel does both at once: per tile of ``tile_q`` consecutive raster
queries, gather the tile's P sampling rows from a static window of the
packed level-0 corner table via a (TQ, K) one-hot MXU contraction, apply
the per-corner bilinear-x-attention weights to the four D-lane chunks of
each row, and reduce over P — all in VMEM. The only HBM output is the
fully reduced (B, Q, 4D) accumulator (the per-level contribution the XLA
path also produces), so the round-2 materialization cost disappears.

Queries are grouped by their SOURCE level: encoder token j is a raster
pixel of some pyramid level, so a tile of consecutive tokens maps to a
narrow band of level-0 image rows (source level 0: ~tile_q/w0 rows;
source level 1: x2 scaling — wider window). ``segment_window_starts``
computes the static per-tile window; exactness is guarded by the caller's
``lax.cond`` fallback to the XLA gather whenever ANY sample escapes its
window (same contract as window_gather; the kernel zero-masks escapes).

Backward: d_table is the transposed one-hot contraction accumulated into
the window rows (a matmul replacing XLA's scalar scatter-add); d_weights
re-samples the window and chunk-reduces against the output cotangent.

Reference kernel being replaced: mmcv ms_deform_attn_cuda via
mmdet/models/utils/transformer.py (the CUDA grid-sample loop).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# dynamic-slice starts into a (sublane, 128)-tiled VMEM table must be
# sublane-aligned (Mosaic "multiple of 8" check); 16 covers bf16 tiles
SUBLANE_ALIGN = 16


def segment_window_starts(n_tokens: int, tile_q: int, src_hw, lvl0_hw,
                          s_pad: int, window: int) -> Tuple[int, ...]:
    """Static window start per tile of ``tile_q`` consecutive source-level
    raster tokens sampling the level-0 packed table.

    src_hw: (h, w) of the tile's SOURCE level; lvl0_hw: (h0, w0) of the
    sampled level. The packed table has w0 + 2 columns per image row and
    ``s_pad`` rows total. Centers use the mid image row of the tile scaled
    into level-0 rows (+1 for the padded-grid offset).
    """
    hs, ws = src_hw
    h0, w0 = lvl0_hw
    w0p = w0 + 2
    starts = []
    n_tiles = -(-n_tokens // tile_q)
    for t in range(n_tiles):
        j0 = t * tile_q
        j1 = min((t + 1) * tile_q, n_tokens) - 1
        y_mid = ((j0 // ws) + (j1 // ws)) / 2.0
        row0 = (y_mid + 0.5) / hs * h0 + 1.0
        center = int(row0 * w0p + w0p // 2)
        st = int(np.clip(center - window // 2, 0, max(s_pad - window, 0)))
        starts.append(st - st % SUBLANE_ALIGN)
    return tuple(starts)


def _make_kernels(K: int, P: int, d: int):
    def fwd_kernel(starts_ref, idx_ref, w_ref, table_ref, out_ref):
        t = pl.program_id(1)
        ws = pl.multiple_of(starts_ref[t], SUBLANE_ALIGN)
        tq = idx_ref.shape[1]
        win = table_ref[0, pl.ds(ws, K), :]                 # (K, 4d)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tq, K), 1)
        acc = jnp.zeros((tq, 4 * d), jnp.float32)
        for p in range(P):
            local = idx_ref[0, :, p][:, None] - ws          # (TQ, 1)
            # escapes never match cols in [0, K) -> zero row for free
            oh = (cols == local).astype(table_ref.dtype)
            g = jnp.dot(oh, win, preferred_element_type=jnp.float32)
            acc += jnp.concatenate(
                [g[:, c * d:(c + 1) * d] * w_ref[0, :, p, c][:, None]
                 for c in range(4)], axis=1)
        out_ref[0] = acc.astype(out_ref.dtype)

    def bwd_kernel(starts_ref, idx_ref, w_ref, g_ref, table_ref,
                   dtable_ref, dw_ref):
        t = pl.program_id(1)
        ws = pl.multiple_of(starts_ref[t], SUBLANE_ALIGN)
        tq = idx_ref.shape[1]
        win = table_ref[0, pl.ds(ws, K), :]
        cols = jax.lax.broadcasted_iota(jnp.int32, (tq, K), 1)
        gout = g_ref[0].astype(jnp.float32)                 # (TQ, 4d)

        @pl.when(t == 0)
        def _():
            dtable_ref[0] = jnp.zeros_like(dtable_ref[0])

        for p in range(P):
            local = idx_ref[0, :, p][:, None] - ws
            oh = (cols == local).astype(table_ref.dtype)
            gw = jnp.concatenate(
                [gout[:, c * d:(c + 1) * d] * w_ref[0, :, p, c][:, None]
                 for c in range(4)], axis=1).astype(table_ref.dtype)
            dtable_ref[0, pl.ds(ws, K), :] += jnp.dot(
                oh.T, gw, preferred_element_type=jnp.float32
            ).astype(dtable_ref.dtype)
            gs = jnp.dot(oh, win, preferred_element_type=jnp.float32)
            for c in range(4):
                dw_ref[0, :, p, c] = (
                    gs[:, c * d:(c + 1) * d]
                    * gout[:, c * d:(c + 1) * d]).sum(axis=1).astype(
                        dw_ref.dtype)

    return fwd_kernel, bwd_kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_window_sample(table: jnp.ndarray, idx: jnp.ndarray,
                        weights: jnp.ndarray, starts: jnp.ndarray,
                        window: int, tile_q: int = 128) -> jnp.ndarray:
    """out[b, q, c*d:(c+1)*d] = sum_p weights[b, q, p, c] *
    table[b, idx[b, q, p], c*d:(c+1)*d], provided each index lies in
    [starts[q // tile_q], starts[...] + window); escaped rows contribute
    ZERO (the caller guarantees coverage via a cond fallback).

    table: (B, S, 4d) packed corner rows with 4d % 128 == 0; idx:
    (B, Q, P) int32 with Q % tile_q == 0; weights: (B, Q, P, 4) FLOAT32
    (Mosaic cannot scalar-index minor dims of 16-bit operands); starts:
    (Q // tile_q,) int32, SUBLANE_ALIGN-multiples. Returns (B, Q, 4d).
    """
    return _fws_fwd(table, idx, weights, starts, window, tile_q)[0]


def _fws_fwd(table, idx, weights, starts, window, tile_q):
    B, S, D = table.shape
    Q, P = idx.shape[1], idx.shape[2]
    fwd_kernel, _ = _make_kernels(window, P, D // 4)
    out = pl.pallas_call(
        fwd_kernel,
        grid=(B, Q // tile_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
    )(starts, idx, weights, table)
    return out, (table, idx, weights, starts)


def _fws_bwd(window, tile_q, res, g):
    table, idx, weights, starts = res
    B, S, D = table.shape
    Q, P = idx.shape[1], idx.shape[2]
    _, bwd_kernel = _make_kernels(window, P, D // 4)
    dtable, dw = pl.pallas_call(
        bwd_kernel,
        grid=(B, Q // tile_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
    )(starts, idx, weights, g, table)
    return dtable, None, dw, None


fused_window_sample.defvjp(_fws_fwd, _fws_bwd)

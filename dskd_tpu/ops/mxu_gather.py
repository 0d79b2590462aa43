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


# ---------------------------------------------------------------------------
# Weighted variant: corner weighting + P-reduction fused into the kernel.
#
# The unweighted mxu_gather materializes (B, Q*P, 4D) gathered rows in HBM,
# which the MSDA caller then multiplies by jnp.repeat(w, D) and reduces over
# P — the round-3 trace bills ~150 ms/step to exactly that marshalling: the
# repeat broadcast alone lowers to a 6-D bf16[B,H,Q,P,4,D] whose (4, D=32)
# minor pair tiles T(4,128) at 4x lane padding. Here the gathered tile, the
# lane-expanded weights and the P-reduction all live in VMEM; HBM sees only
# idx, w, table and the (B, Q, 4D) result.
# ---------------------------------------------------------------------------


def _corner_selector(d: int, dtype):
    """(4, 4d) constant with E[c, c*d:(c+1)*d] = 1: w128 = w @ E expands
    each corner weight across its d-lane chunk on the MXU (avoids an
    in-kernel repeat/reshape on the minor dims, which Mosaic dislikes)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * d), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * d), 1)
    return (lanes // d == rows).astype(dtype)


def _fwd_w_kernel(idx_ref, w_ref, table_ref, out_ref, *, P, D):
    tq = idx_ref.shape[1]
    s = table_ref.shape[1]
    table = table_ref[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tq, s), 1)
    sel = _corner_selector(D, jnp.float32)
    acc = jnp.zeros((tq, 4 * D), jnp.float32)
    for p in range(P):
        onehot = (cols == idx_ref[0, :, p:p + 1]).astype(table.dtype)
        g = jnp.dot(onehot, table, preferred_element_type=jnp.float32)
        wp = w_ref[0, :, 4 * p:4 * (p + 1)].astype(jnp.float32)
        acc = acc + g * jnp.dot(wp, sel)
    out_ref[0] = acc.astype(out_ref.dtype)


def _bwd_w_kernel(idx_ref, w_ref, g_ref, table_ref, dtable_ref, dw_ref,
                  *, P, D):
    qi = pl.program_id(1)
    tq = idx_ref.shape[1]
    s = table_ref.shape[1]
    table = table_ref[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tq, s), 1)
    sel = _corner_selector(D, jnp.float32)
    dout = g_ref[0].astype(jnp.float32)

    @pl.when(qi == 0)
    def _():
        dtable_ref[0] = jnp.zeros_like(dtable_ref[0])

    for p in range(P):
        onehot = (cols == idx_ref[0, :, p:p + 1]).astype(table.dtype)
        wp = w_ref[0, :, 4 * p:4 * (p + 1)].astype(jnp.float32)
        wg = dout * jnp.dot(wp, sel)                       # (TQ, 4D)
        dtable_ref[0] += jnp.dot(onehot.T, wg.astype(table.dtype),
                                 preferred_element_type=jnp.float32
                                 ).astype(dtable_ref.dtype)
        gp = jnp.dot(onehot, table,
                     preferred_element_type=jnp.float32)   # (TQ, 4D)
        dw_ref[0, :, 4 * p:4 * (p + 1)] = jnp.dot(
            dout * gp, sel.T).astype(dw_ref.dtype)         # (TQ, 4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def mxu_gather_weighted(table: jnp.ndarray, idx: jnp.ndarray,
                        w: jnp.ndarray, tile_q: int = 512) -> jnp.ndarray:
    """out[b, q] = sum_p table[b, idx[b, q, p]] * repeat(w[b, q, p], D).

    table: (B, S, 4D) packed corner rows (4D a multiple of 128, S*4D*2
    bytes well under VMEM). idx: (B, Q, P) int32 in [0, S). w: (B, Q, P, 4)
    per-corner weights (already folded with attention weights).
    Returns (B, Q, 4D); the caller folds the four D-chunks.
    """
    return _mxu_gw_fwd(table, idx, w, tile_q)[0]


def _mxu_gw_fwd(table, idx, w, tile_q):
    B, S, D4 = table.shape
    _, Q, P = idx.shape
    D = D4 // 4
    Qp = _round_up(Q, tile_q)
    idx_p = jnp.pad(idx, ((0, 0), (0, Qp - Q), (0, 0)))
    w_p = jnp.pad(w.reshape(B, Q, P * 4),
                  ((0, 0), (0, Qp - Q), (0, 0)))           # pad rows: w=0
    grid = (B, Qp // tile_q)
    out = pl.pallas_call(
        functools.partial(_fwd_w_kernel, P=P, D=D),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_q, P), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, 4 * P), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D4), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, D4), lambda b, q: (b, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Qp, D4), table.dtype),
    )(idx_p, w_p, table)
    return out[:, :Q], (table, idx, w)


def _mxu_gw_bwd(tile_q, res, g):
    table, idx, w = res
    B, S, D4 = table.shape
    _, Q, P = idx.shape
    D = D4 // 4
    Qp = _round_up(Q, tile_q)
    idx_p = jnp.pad(idx, ((0, 0), (0, Qp - Q), (0, 0)))
    w_p = jnp.pad(w.reshape(B, Q, P * 4), ((0, 0), (0, Qp - Q), (0, 0)))
    g_p = jnp.pad(g.astype(table.dtype),
                  ((0, 0), (0, Qp - Q), (0, 0)))           # pad dout: 0
    grid = (B, Qp // tile_q)
    dtable, dw = pl.pallas_call(
        functools.partial(_bwd_w_kernel, P=P, D=D),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_q, P), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, 4 * P), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, D4), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D4), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, S, D4), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, 4 * P), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, D4), table.dtype),
            jax.ShapeDtypeStruct((B, Qp, 4 * P), w.dtype),
        ],
    )(idx_p, w_p, g_p, table)
    return dtable, None, dw[:, :Q].reshape(B, Q, P, 4)


mxu_gather_weighted.defvjp(_mxu_gw_fwd, _mxu_gw_bwd)

"""Windowed-matmul BACKWARD for the level-0 MSDA gather (forward stays
the XLA gather).

Round-3 closed the FORWARD alternatives for the big-level sampling: the
XLA scalar-loop gather is the measured floor (PERF.md findings 7/11).
Its VJP, however, is a scatter-add into the packed corner table — the
round-5 flagship trace bills >=11 ms/step to bf16[174592,128] scatter
fusions. This module keeps the forward bit-identical (take_along_axis
loop over P) and swaps ONLY the cotangent computation for a Pallas
kernel: per tile of consecutive raster queries, the contribution to the
table is a transposed one-hot MXU contraction accumulated into a static
row window (dtable[ws:ws+K] += oh.T @ (g * w)), mirroring
fused_window._fws_bwd but in the pack-kernel (B, S, H, 4D) layout so
the forward keeps the transpose-free path (finding 8).

Exactness: the caller guards with the same lax.cond in-window test as
the fused-window forward — any sample escaping its tile window falls
back to the plain VJP. Opt-in via DSKD_WINBWD=1 until the chip A/B
lands a number.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_window import SUBLANE_ALIGN


def _plain_sample(packedk, flat, cw):
    """The XLA forward (identical to the msda.py pack-kernel branch):
    out[b, q, h, 4D] = sum_p gather(packedk, flat[..., p]) * repeat(w)."""
    B, Q, H, P = flat.shape
    D4 = packedk.shape[-1]
    D = D4 // 4
    acc = jnp.zeros((B, Q, H, D4), packedk.dtype)
    for p in range(P):
        g = jnp.take_along_axis(packedk, flat[:, :, :, p][..., None],
                                axis=1)
        acc = acc + g * jnp.repeat(cw[:, :, :, p], D, axis=-1)
    return acc


def _make_bwd_kernel(K: int, P: int, d: int):
    # all refs ride the H-MAJOR layout (B, H, ...) so every block keeps
    # its last two dims equal to the array's (the Mosaic (8, 128)
    # block-shape rule rejects interior H-dim blocks of size 1)
    def bwd_kernel(starts_ref, idx_ref, w_ref, g_ref, table_ref,
                   dtable_ref, dw_ref):
        t = pl.program_id(2)
        ws = pl.multiple_of(starts_ref[t], SUBLANE_ALIGN)
        tq = idx_ref.shape[2]
        win = table_ref[0, 0, pl.ds(ws, K), :]              # (K, 4d)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tq, K), 1)
        gout = g_ref[0, 0].astype(jnp.float32)              # (TQ, 4d)

        @pl.when(t == 0)
        def _():
            dtable_ref[0, 0] = jnp.zeros_like(dtable_ref[0, 0])

        for p in range(P):
            local = idx_ref[0, 0, :, p][:, None] - ws       # (TQ, 1)
            # escapes never match cols in [0, K) -> zero row for free
            oh = (cols == local).astype(table_ref.dtype)
            gw = jnp.concatenate(
                [gout[:, c * d:(c + 1) * d]
                 * w_ref[0, 0, :, p, c][:, None]
                 for c in range(4)], axis=1).astype(table_ref.dtype)
            dtable_ref[0, 0, pl.ds(ws, K), :] += jnp.dot(
                oh.T, gw, preferred_element_type=jnp.float32
            ).astype(dtable_ref.dtype)
            gs = jnp.dot(oh, win, preferred_element_type=jnp.float32)
            for c in range(4):
                dw_ref[0, 0, :, p, c] = (
                    gs[:, c * d:(c + 1) * d]
                    * gout[:, c * d:(c + 1) * d]).sum(axis=1).astype(
                        dw_ref.dtype)

    return bwd_kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def windowed_bwd_sample(packedk, flat, cw, starts, window: int,
                        tile_q: int = 128):
    """Forward == _plain_sample (XLA gather floor); backward = windowed
    transpose MXU accumulation. packedk: (B, S, H, 4D); flat:
    (B, Q, H, P) int32 with Q % tile_q == 0; cw: (B, Q, H, P, 4) f32;
    starts: (Q // tile_q,) int32 SUBLANE_ALIGN-multiples. The caller
    guarantees every flat index lies inside its tile's window (cond
    fallback otherwise)."""
    return _wbs_fwd(packedk, flat, cw, starts, window, tile_q)[0]


def _wbs_fwd(packedk, flat, cw, starts, window, tile_q):
    return (_plain_sample(packedk, flat, cw),
            (packedk, flat, cw, starts))


def _wbs_bwd(window, tile_q, res, g):
    packedk, flat, cw, starts = res
    B, S, H, D4 = packedk.shape
    Q, P = flat.shape[1], flat.shape[3]
    kernel = _make_bwd_kernel(window, P, D4 // 4)
    # H-major views (one cheap HBM transpose each way in the backward
    # only — the forward keeps the transpose-free pack-kernel layout)
    flat_h = flat.transpose(0, 2, 1, 3)            # (B, H, Q, P)
    cw_h = cw.transpose(0, 2, 1, 3, 4)             # (B, H, Q, P, 4)
    g_h = g.transpose(0, 2, 1, 3)                  # (B, H, Q, 4D)
    tbl_h = packedk.transpose(0, 2, 1, 3)          # (B, H, S, 4D)
    dtable, dw = pl.pallas_call(
        kernel,
        grid=(B, H, Q // tile_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tile_q, P), lambda b, h, t: (b, h, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_q, P, 4),
                         lambda b, h, t: (b, h, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_q, D4), lambda b, h, t: (b, h, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, D4), lambda b, h, t: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, S, D4), lambda b, h, t: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_q, P, 4),
                         lambda b, h, t: (b, h, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, S, D4), packedk.dtype),
            jax.ShapeDtypeStruct((B, H, Q, P, 4), cw.dtype),
        ],
    )(starts, flat_h, cw_h, g_h, tbl_h)
    return (dtable.transpose(0, 2, 1, 3), None,
            dw.transpose(0, 2, 1, 3, 4), None)


windowed_bwd_sample.defvjp(_wbs_fwd, _wbs_bwd)

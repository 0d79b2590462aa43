"""Fused corner-table packing: a Pallas kernel that writes the MSDA
packed-corner table in ONE pass (one HBM read of the level features, one
HBM write of the table).

Motivation (PERF.md round-3 trace): ~25% of the flagship step is
reshape/copy/pad layout movement, dominated by `_pack_corners` rebuilding
the (B, S', H, 4D) bilinear-corner tables per (layer, level, model) via an
XLA pad -> 4 slices -> concat -> pad -> transpose chain that materializes
several intermediate copies of 4x the feature bytes. The table itself is a
pure static re-indexing of the level features, so a kernel can emit it
with a single write:

    table[yp, xp, hd, c*D:(c+1)*D] = v[yp + dy_c - 1, xp + dx_c - 1, hd]
        (zero outside the map), corners c = (dy, dx) in
        ((0,0), (0,1), (1,0), (1,1)) - same layout as ops/msda.py
        `_pack_corners(head_major=False)`.

Layout trick that makes the kernel cheap: the level features are viewed as
(B, h, w*H, D) - a contiguous view of the (B, S, H, D) value - so the
x-shift of a corner is a shift by H SUBLANES, and the head-major corner
blocks [c0 | c1 | c2 | c3] of one (xp, hd) row come out as a plain LANE
concatenation of four D=32-wide slices: no transposes anywhere. The y
halo is handled with the two-block (prev, cur) trick plus logical-line
masking, so arbitrary tile counts clamp safely at both edges.

The VJP is expressed in XLA: grad wrt v is the sum of the four shifted
slices of the cotangent table (one read, one fused write).

Reference: mmcv MultiScaleDeformableAttention value packing semantics
(mmdet/models/utils/transformer.py:893-1055); bilinear corner layout
mirrors ops/msda.py `_pack_corners`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CORNERS = ((0, 0), (0, 1), (1, 0), (1, 1))


def _kernel(x_prev_ref, x_cur_ref, out_ref, *, h: int, w: int, heads: int,
            tile: int):
    t = pl.program_id(1)
    # logical input lines of the concatenated (prev, cur) slab
    glob = (t - 1) * tile + jax.lax.broadcasted_iota(
        jnp.int32, (2 * tile, 1, 1), 0)
    full = jnp.concatenate([x_prev_ref[0], x_cur_ref[0]], axis=0)
    full = jnp.where((glob >= 0) & (glob < h), full, 0)
    # pad x by one H-sublane group left, two right: sublane s = x*H + hd.
    # The dx=1 slices start at sublane offset H=8 — intra-tile for bf16's
    # (16, 128) tiles, which Mosaic cannot lane-concatenate; in f32's
    # (8, 128) tiles the offset is tile-aligned, so slice/concat in f32.
    fullp = jnp.pad(full, ((0, 0), (heads, 2 * heads), (0, 0)))
    fullp = fullp.astype(jnp.float32)
    parts = []
    for (dy, dx) in _CORNERS:
        # table line yp = t*tile + i needs v line yp + dy - 1, which sits
        # at concat row tile + i + dy - 1 (prev holds lines [tT-T, tT))
        sl = fullp[tile + dy - 1: 2 * tile + dy - 1,
                   dx * heads: (dx + w + 2) * heads, :]
        parts.append(sl)
    out_ref[0] = jnp.concatenate(parts, axis=-1).astype(out_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def pack_corners_fused(v: jnp.ndarray, h: int, w: int,
                       tile: int = 8) -> jnp.ndarray:
    """(B, h*w, H, D) level features -> (B, S'', H, 4D) corner table.

    Row yp*(w+2)+xp holds [v(yp-1,xp-1), v(yp-1,xp), v(yp,xp-1), v(yp,xp)]
    per head (zeros outside the map) - identical to ops/msda.py
    `_pack_corners(head_major=False)` for the first (h+2)*(w+2) rows.
    S'' = ceil((h+2)/tile)*tile*(w+2) >= (h+2)*(w+2); tail rows are
    garbage and must never be gathered (MSDA's clipped flat indices never
    exceed (h+2)*(w+2)-1).
    """
    return _pack_fwd(v, h, w, tile)[0]


def _pack_fwd(v, h, w, tile):
    B, S, H, D = v.shape
    x = v.reshape(B, h, w * H, D)
    nt = -(-(h + 2) // tile)            # output line tiles
    nin = -(-h // tile)                 # input line blocks

    grid = (B, nt)
    kern = functools.partial(_kernel, h=h, w=w, heads=H, tile=tile)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, w * H, D),
                         lambda b, t: (b, jnp.clip(t - 1, 0, nin - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, w * H, D),
                         lambda b, t: (b, jnp.clip(t, 0, nin - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, (w + 2) * H, 4 * D),
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nt * tile, (w + 2) * H, 4 * D),
                                       v.dtype),
    )(x, x)
    return out.reshape(B, nt * tile * (w + 2), H, 4 * D), ()


def _pack_bwd(h, w, tile, _res, g):
    """grad wrt v: every v[y, x] was copied to 4 table cells; sum the four
    shifted slices of the cotangent (pure XLA - fuses to one pass)."""
    B = g.shape[0]
    H = g.shape[2]
    D = g.shape[3] // 4
    nt = -(-(h + 2) // tile)
    gt = g.reshape(B, nt * tile, w + 2, H, 4 * D)[:, :h + 2]
    dv = None
    for c, (dy, dx) in enumerate(_CORNERS):
        # table[yp, xp, :, c] = v[yp+dy-1, xp+dx-1] => v[y, x] receives
        # from table[y+1-dy, x+1-dx, :, c]
        sl = gt[:, 1 - dy: 1 - dy + h, 1 - dx: 1 - dx + w, :,
                c * D:(c + 1) * D]
        dv = sl if dv is None else dv + sl
    return (dv.reshape(B, h * w, H, D),)


pack_corners_fused.defvjp(_pack_fwd, _pack_bwd)

"""Multi-scale deformable attention sampling core.

TPU-native formulation of the reference's CUDA kernel
(mmcv.ops.MultiScaleDeformableAttention -> ms_deform_attn_cuda): each query
bilinearly samples ``num_points`` locations from every feature level and
every head, then reduces with softmaxed attention weights.

Semantics match ``F.grid_sample(align_corners=False, padding_mode='zeros')``
applied per level: a normalized location p in [0, 1] maps to pixel space as
``p * size - 0.5``; out-of-bounds corners contribute zero.

TPU memory design (what makes this fast on real chips):
  * the four bilinear corners of one sample live in ONE 4*D=128-wide packed
    row, so every gather is exactly lane-aligned — the naive formulation's
    (…, D=32) gathers suffer a 4x tile-padding blowup ((8,128) tiling pads
    32 lanes to 128), which OOMs the encoder backward at batch 8;
  * gathers run per sampling point with immediate weighted accumulation, so
    the peak intermediate is (B, H, Q, 128) — never (B, Q, H, L, P, D);
  * layout (B, H, Q, 128) keeps the big Q axis on sublanes (pad-free).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _pack_corners(v: jnp.ndarray, h: int, w: int,
                  head_major: bool = True) -> jnp.ndarray:
    """(B, h*w, H, D) level features -> zero-padded packed corners.

    Returns (B, H, (h+2)*(w+2), 4*D): row r = base pixel (y0+1, x0+1) of the
    padded map; the 4*D blocks hold [v(y0,x0), v(y0,x0+1), v(y0+1,x0),
    v(y0+1,x0+1)] of the ORIGINAL map (zeros outside).

    ``head_major=False`` keeps the natural (B, S', H, 4D) layout — no
    whole-table transpose write; the gather then indexes the middle axis
    (DSKD_PACK_NOTRANS=1, PERF.md round 3).
    """
    B, S, H, D = v.shape
    vm = v.reshape(B, h, w, H, D)
    vp = jnp.pad(vm, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    p00 = vp[:, :-1, :-1]          # (B, h+1, w+1, H, D) value at (y0, x0)
    p01 = vp[:, :-1, 1:]
    p10 = vp[:, 1:, :-1]
    p11 = vp[:, 1:, 1:]
    packed = jnp.concatenate([p00, p01, p10, p11], axis=-1)
    # base grid covers (h+1) x (w+1) valid bases; pad to (h+2)(w+2) for a
    # uniform flat index space y0p * (w+2) + x0p with y0p in [0, h+1]
    packed = jnp.pad(packed, ((0, 0), (0, 1), (0, 1), (0, 0), (0, 0)))
    packed = packed.reshape(B, (h + 2) * (w + 2), H, 4 * D)
    if not head_major:
        return packed                         # (B, S', H, 4D)
    return packed.transpose(0, 2, 1, 3)       # (B, H, S', 4D)


def pack_corners_raw(memory: jnp.ndarray,
                     spatial_shapes: Sequence[Tuple[int, int]]):
    """Pack UNPROJECTED (B, S, C) memory into per-level corner tables.

    Decoder cross-attention optimization (PERF.md round 3): the encoder
    memory is constant across all decoder layers, and each layer's
    ``value_proj`` is linear — so the bilinear gather + corner/attention
    weighting can run in RAW C-space against tables packed ONCE per model,
    with the per-layer projection applied to the (B, Q, H, C) reduction
    instead of the (B, S, C) memory. Removes the per-(layer, level) table
    rebuild the round-2 trace billed ~22% of the step to.

    Returns a list of (B, (h+2)*(w+2), 4*C) tables; row r = base pixel
    (y0+1, x0+1) of the zero-padded map, blocks [v00, v01, v10, v11].
    """
    B, S, C = memory.shape
    tables = []
    start = 0
    for (h, w) in spatial_shapes:
        v = jax.lax.dynamic_slice_in_dim(memory, start, h * w, axis=1)
        vm = v.reshape(B, h, w, C)
        vp = jnp.pad(vm, ((0, 0), (1, 1), (1, 1), (0, 0)))
        p00 = vp[:, :-1, :-1]
        p01 = vp[:, :-1, 1:]
        p10 = vp[:, 1:, :-1]
        p11 = vp[:, 1:, 1:]
        packed = jnp.concatenate([p00, p01, p10, p11], axis=-1)
        packed = jnp.pad(packed, ((0, 0), (0, 1), (0, 1), (0, 0)))
        tables.append(packed.reshape(B, (h + 2) * (w + 2), 4 * C))
        start += h * w
    return tables


def ms_deform_attn_core_premap(tables,
                               spatial_shapes: Sequence[Tuple[int, int]],
                               sampling_locations: jnp.ndarray,
                               attention_weights: jnp.ndarray,
                               valid_wh: jnp.ndarray):
    """Deformable sampling against pre-packed RAW corner tables.

    Args:
      tables: ``pack_corners_raw`` output — list of (B, S'_l, 4C).
      sampling_locations: (B, Q, H, L, P, 2) normalized (x, y).
      attention_weights: (B, Q, H, L, P), softmaxed over L*P.
      valid_wh: (B, L, 2) f32 valid (w, h) token counts per level. Replaces
        the key_padding_mask zeroing of the projected path: the reference's
        padding masks are exact rectangles (level_masks_and_ratios), so a
        corner is dropped analytically iff x >= valid_w or y >= valid_h —
        bit-identical to gathering a zeroed token.

    Returns (acc, wsum): (B, Q, H, C) raw-space weighted samples and
    (B, Q, H) total surviving corner weight (for the value_proj bias term:
    projected = acc @ W + b * wsum, linearity of the projection).
    """
    B, Q, H = sampling_locations.shape[:3]
    P = sampling_locations.shape[4]
    C = tables[0].shape[-1] // 4
    dt = tables[0].dtype
    acc = jnp.zeros((B, Q, H, C), dt)
    wsum = jnp.zeros((B, Q, H), dt)
    for lvl, (h, w) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, lvl]         # (B, Q, H, P, 2)
        x = loc[..., 0].astype(jnp.float32) * w - 0.5
        y = loc[..., 1].astype(jnp.float32) * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = (x - x0).astype(dt)
        ty = (y - y0).astype(dt)
        vw = valid_wh[:, lvl, 0][:, None, None, None]  # (B, 1, 1, 1)
        vh = valid_wh[:, lvl, 1][:, None, None, None]
        gx0 = (x0 >= 0) & (x0 < vw)
        gx1 = (x0 + 1 >= 0) & (x0 + 1 < vw)
        gy0 = (y0 >= 0) & (y0 < vh)
        gy1 = (y0 + 1 >= 0) & (y0 + 1 < vh)
        w00 = ((1 - tx) * (1 - ty) * (gx0 & gy0)).astype(dt)
        w01 = (tx * (1 - ty) * (gx1 & gy0)).astype(dt)
        w10 = ((1 - tx) * ty * (gx0 & gy1)).astype(dt)
        w11 = (tx * ty * (gx1 & gy1)).astype(dt)
        cw = jnp.stack([w00, w01, w10, w11], axis=-1)  # (B, Q, H, P, 4)
        cw = cw * attention_weights[:, :, :, lvl, :, None]

        x0c = jnp.clip(x0 + 1, 0, w + 1).astype(jnp.int32)
        y0c = jnp.clip(y0 + 1, 0, h + 1).astype(jnp.int32)
        flat = (y0c * (w + 2) + x0c).reshape(B, Q * H * P)
        g = jnp.take_along_axis(tables[lvl], flat[..., None], axis=1)
        g = g.reshape(B, Q, H, P, 4, C)
        acc = acc + (g * cw[..., None]).sum(axis=(3, 4))
        wsum = wsum + cw.sum(axis=(3, 4))
    return acc, wsum


def ms_deform_attn_core(value: jnp.ndarray,
                        spatial_shapes: Sequence[Tuple[int, int]],
                        sampling_locations: jnp.ndarray,
                        attention_weights: jnp.ndarray,
                        mxu_gather_max_rows: int = 2500,
                        raster_queries: bool = False,
                        window_tile_q: int = 128,
                        window_rows: int = 0,
                        fwin_tile_q: int = 128) -> jnp.ndarray:
    """Fused multi-scale deformable sampling.

    Args:
      value: (B, S, H, D) flattened multi-level features (S = sum h*w).
      spatial_shapes: static list of (h, w) per level.
      sampling_locations: (B, Q, H, L, P, 2) normalized (x, y).
      attention_weights: (B, Q, H, L, P), softmaxed over L*P.
      mxu_gather_max_rows: on TPU, levels whose packed table has at most
        this many rows gather via the MXU one-hot kernel (2x+ faster than
        XLA's scalar-loop gather — see ops/mxu_gather.py / PERF.md);
        larger levels use the XLA gather. 0 disables the kernel.
      raster_queries: True for the ENCODER self-attention, where query q IS
        flattened token q. With window_rows > 0 (DSKD_WINDOW_ROWS env),
        level-0 queries sampling level 0 use the windowed MXU kernel
        (ops/window_gather.py) with a lax.cond fallback to the XLA gather
        whenever any sample escapes its static window — bit-exact either
        way. OFF by default: measured slower than the XLA gather at
        window=1024 AND its materialized (B, H, n0, P, 4, D) gather output
        costs ~5G HBM that the fused XLA path never allocates, which OOMs
        the no-remat step (PERF.md round 2).

    Returns:
      (B, Q, H*D).
    """
    B, S, H, D = value.shape
    Q = sampling_locations.shape[1]
    P = sampling_locations.shape[4]
    dt = value.dtype
    import os
    env_rows = os.environ.get("DSKD_MXU_GATHER_ROWS")
    if env_rows is not None:       # bisect/override knob
        mxu_gather_max_rows = int(env_rows)
    env_window = os.environ.get("DSKD_WINDOW_ROWS")
    if env_window is not None:     # windowed level-0 kernel sweep knob;
        window_rows = int(env_window)   # 0 disables the windowed path
    # fused windowed sampling (ops/fused_window.py): encoder level-0
    # gather + corner weighting + P-reduce in one MXU kernel, windows per
    # source-level query segment, cond fallback to the XLA gather on any
    # escape. Opt-in via DSKD_FWIN=1 until the chip A/B lands a number;
    # margin rows tune the window height.
    fwin_on = os.environ.get("DSKD_FWIN", "0") == "1"
    fwin_margin = int(os.environ.get("DSKD_FWIN_MARGIN", "6"))
    # fused one-hot sampling kernel (ops/fused_sample.py): levels whose RAW
    # table has at most this many rows skip corner packing + post-weighting
    # entirely. 0 = off (measure on chip before making it the default).
    fused_max_rows = int(os.environ.get("DSKD_FUSED_ROWS", "0"))
    # Pallas corner-table pack (ops/pack_kernel.py): big levels build the
    # packed table in ONE kernel write instead of the XLA pad/concat/
    # transpose chain, and gather it middle-axis (no head-major transpose).
    # Targets the ~25% reshape/copy/pad trace bucket. DEFAULT ON since the
    # round-3 chip A/B with host-fetch timing: 5.853 vs 5.389 img/s/chip
    # (+8.6% end-to-end incl. VJP, PERF.md finding 8); DSKD_PACK_KERNEL=0
    # restores the XLA pack chain.
    pack_kernel = os.environ.get("DSKD_PACK_KERNEL", "1") == "1"
    use_mxu = (mxu_gather_max_rows > 0
               and (jax.default_backend() == "tpu"
                    # test hook: exercise the Pallas paths in interpret mode
                    or os.environ.get("DSKD_FORCE_MXU") == "1"))
    # transpose-free table layout: (B, S', H, 4D) + middle-axis gather —
    # skips the whole-table (0,2,1,3) transpose write per (layer, level)
    # AND the final (B,H,Q,D)->(B,Q,H,D) output transpose. Bit-identical.
    notrans = os.environ.get("DSKD_PACK_NOTRANS", "0") == "1"
    if notrans:
        out_q = jnp.zeros((B, Q, H, D), dt)
        start = 0
        for lvl, (h, w) in enumerate(spatial_shapes):
            v = jax.lax.dynamic_slice_in_dim(value, start, h * w, axis=1)
            loc = sampling_locations[:, :, :, lvl]     # (B, Q, H, P, 2)
            x = loc[..., 0].astype(jnp.float32) * w - 0.5
            y = loc[..., 1].astype(jnp.float32) * h - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            tx = (x - x0).astype(dt)
            ty = (y - y0).astype(dt)
            inx0 = (x0 >= 0) & (x0 < w)
            inx1 = (x0 + 1 >= 0) & (x0 + 1 < w)
            iny0 = (y0 >= 0) & (y0 < h)
            iny1 = (y0 + 1 >= 0) & (y0 + 1 < h)
            w00 = ((1 - tx) * (1 - ty) * (inx0 & iny0)).astype(dt)
            w01 = (tx * (1 - ty) * (inx1 & iny0)).astype(dt)
            w10 = ((1 - tx) * ty * (inx0 & iny1)).astype(dt)
            w11 = (tx * ty * (inx1 & iny1)).astype(dt)
            cw = jnp.stack([w00, w01, w10, w11], -1)   # (B, Q, H, P, 4)
            cw = cw * attention_weights[:, :, :, lvl, :, None]
            packed = _pack_corners(v, h, w, head_major=False)
            x0c = jnp.clip(x0 + 1, 0, w + 1).astype(jnp.int32)
            y0c = jnp.clip(y0 + 1, 0, h + 1).astype(jnp.int32)
            flat = y0c * (w + 2) + x0c                 # (B, Q, H, P)
            for p in range(P):
                g = jnp.take_along_axis(
                    packed, flat[:, :, :, p][..., None], axis=1)
                g = g.reshape(B, Q, H, 4, D)
                wp = cw[:, :, :, p]                    # (B, Q, H, 4)
                out_q = out_q + (g * wp[..., None]).sum(axis=3)
            start += h * w
        return out_q.reshape(B, Q, H * D)

    out = jnp.zeros((B, H, Q, D), dt)
    out_q = None                       # (B, Q, H, D) pack-kernel accumulator
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = jax.lax.dynamic_slice_in_dim(value, start, h * w, axis=1)

        loc = sampling_locations[:, :, :, lvl]         # (B, Q, H, P, 2)
        x = loc[..., 0].astype(jnp.float32) * w - 0.5
        y = loc[..., 1].astype(jnp.float32) * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = (x - x0).astype(dt)
        ty = (y - y0).astype(dt)
        # per-corner in-bounds gates (original-map coordinates)
        inx0 = (x0 >= 0) & (x0 < w)
        inx1 = (x0 + 1 >= 0) & (x0 + 1 < w)
        iny0 = (y0 >= 0) & (y0 < h)
        iny1 = (y0 + 1 >= 0) & (y0 + 1 < h)
        w00 = ((1 - tx) * (1 - ty) * (inx0 & iny0)).astype(dt)
        w01 = (tx * (1 - ty) * (inx1 & iny0)).astype(dt)
        w10 = ((1 - tx) * ty * (inx0 & iny1)).astype(dt)
        w11 = (tx * ty * (inx1 & iny1)).astype(dt)
        cw = jnp.stack([w00, w01, w10, w11], axis=-1)  # (B, Q, H, P, 4)
        cw = cw * attention_weights[:, :, :, lvl, :, None]

        if use_mxu and 0 < h * w <= fused_max_rows:
            # fused path: no packed table, one weighted one-hot contraction
            # per (b, h) against the RAW level features. Unclipped c00 is
            # safe: every out-of-range / row-wrapped corner carries zero
            # weight by the gates above (ops/fused_sample.py docstring).
            from .fused_sample import fused_msda_sample
            c00 = (y0 * w + x0).astype(jnp.int32)      # (B, Q, H, P)
            idx = c00.transpose(0, 2, 1, 3).reshape(B * H, Q, P)
            wts = cw.transpose(0, 2, 1, 3, 4).reshape(
                B * H, Q, P, 4).astype(jnp.float32)
            tbl = v.transpose(0, 2, 1, 3).reshape(B * H, h * w, D)
            tile_q = 128
            q_pad = (-Q) % tile_q
            if q_pad:
                idx = jnp.pad(idx, ((0, 0), (0, q_pad), (0, 0)))
                wts = jnp.pad(wts, ((0, 0), (0, q_pad), (0, 0), (0, 0)))
            acc = fused_msda_sample(tbl, idx, wts, w, tile_q=tile_q)
            out = out + acc[:, :Q].reshape(B, H, Q, D)
            start += h * w
            continue

        sp = (h + 2) * (w + 2)
        if (pack_kernel and use_mxu and sp > mxu_gather_max_rows
                and window_rows == 0 and not fwin_on):
            # one-write Pallas corner table + middle-axis gather; keep the
            # corner axis fused in the 128-lane dim (finding 5) and the
            # (B, Q, H, D) layout to skip the head-major transposes.
            from .pack_kernel import pack_corners_fused
            packedk = pack_corners_fused(v, h, w)      # (B, S'', H, 4D)
            x0c = jnp.clip(x0 + 1, 0, w + 1).astype(jnp.int32)
            y0c = jnp.clip(y0 + 1, 0, h + 1).astype(jnp.int32)
            flat = y0c * (w + 2) + x0c                 # (B, Q, H, P)
            # DSKD_WINBWD=1: keep THIS forward (the measured floor) but
            # compute its table/weight cotangents with the windowed
            # transpose-MXU kernel instead of XLA's scatter-add
            # (ops/window_bwd.py; >=11 ms/step of bf16 scatter fusions in
            # the round-5 flagship trace). Same per-source-level window
            # segmentation + lax.cond exactness fallback as the fused
            # window forward.
            winbwd = (os.environ.get("DSKD_WINBWD", "0") == "1"
                      and raster_queries
                      and Q == sum(hh * ww for hh, ww in spatial_shapes))
            if winbwd:
                from .fused_window import segment_window_starts
                from .window_bwd import (_plain_sample,
                                         windowed_bwd_sample)
                tile_q = fwin_tile_q
                margin = int(os.environ.get("DSKD_FWIN_MARGIN", "6"))
                spk = packedk.shape[1]
                parts = []
                q0 = 0
                for (hs, ws_) in spatial_shapes:
                    n = hs * ws_
                    rows_per_tile = (tile_q / ws_) * (h / hs)
                    need = int(rows_per_tile) + 2 * margin + 2
                    k_seg = min(-(-(need * (w + 2)) // 16) * 16, spk)
                    n_pad = -(-n // tile_q) * tile_q
                    f_s = flat[:, q0:q0 + n]
                    # Mosaic cannot scalar-index minor dims of 16-bit
                    # operands -> weights ride f32 (fwin does the same)
                    w_s = cw[:, q0:q0 + n].astype(jnp.float32)
                    if k_seg > spk // 2 or n < tile_q:
                        parts.append(_plain_sample(packedk, f_s, w_s))
                        q0 += n
                        continue
                    starts = segment_window_starts(
                        n, tile_q, (hs, ws_), (h, w), spk, k_seg)
                    starts_a = jnp.asarray(starts, jnp.int32)
                    if n_pad > n:   # pad into the last tile's window
                        f_s = jnp.pad(
                            f_s, ((0, 0), (0, n_pad - n), (0, 0),
                                  (0, 0)),
                            constant_values=starts[-1])
                        w_s = jnp.pad(
                            w_s, ((0, 0), (0, n_pad - n), (0, 0),
                                  (0, 0), (0, 0)))
                    local = f_s - jnp.repeat(
                        starts_a, tile_q)[None, :, None, None]
                    in_win = ((local >= 0) & (local < k_seg)).all()
                    seg = jax.lax.cond(
                        in_win,
                        lambda ops, _k=k_seg: windowed_bwd_sample(
                            packedk, ops[0], ops[1], starts_a, _k,
                            tile_q),
                        lambda ops: _plain_sample(
                            packedk, ops[0], ops[1]),
                        (f_s, w_s))
                    parts.append(seg[:, :n])
                    q0 += n
                acc = jnp.concatenate(parts, axis=1).astype(dt)
                if out_q is None:
                    out_q = jnp.zeros((B, Q, H, D), dt)
                out_q = out_q + sum(acc[..., c * D:(c + 1) * D]
                                    for c in range(4))
                start += h * w
                continue
            acc = jnp.zeros((B, Q, H, 4 * D), dt)
            for p in range(P):
                g = jnp.take_along_axis(
                    packedk, flat[:, :, :, p][..., None], axis=1)
                acc = acc + g * jnp.repeat(cw[:, :, :, p], D, axis=-1)
            if out_q is None:
                out_q = jnp.zeros((B, Q, H, D), dt)
            out_q = out_q + sum(acc[..., c * D:(c + 1) * D]
                                for c in range(4))
            start += h * w
            continue

        packed = _pack_corners(v, h, w)                # (B, H, S', 4D)

        # flat base index into the padded (h+2)(w+2) grid
        x0c = jnp.clip(x0 + 1, 0, w + 1).astype(jnp.int32)
        y0c = jnp.clip(y0 + 1, 0, h + 1).astype(jnp.int32)
        flat = y0c * (w + 2) + x0c                     # (B, Q, H, P)

        n0 = h * w
        use_window = (use_mxu and window_rows > 0
                      and sp > mxu_gather_max_rows
                      and raster_queries and start == 0 and Q >= n0
                      and n0 % window_tile_q == 0 and sp >= window_rows)
        use_fwin = (use_mxu and fwin_on and raster_queries
                    and sp > mxu_gather_max_rows
                    and Q == sum(hh * ww for hh, ww in spatial_shapes))
        if use_mxu and sp <= mxu_gather_max_rows:
            if os.environ.get("DSKD_WGATHER", "1") == "1":
                # fused weighted gather: corner weighting + P-reduction
                # run INSIDE the one-hot kernel, so the (B*H, Q*P, 4D)
                # gathered rows, the repeat(w, D) lane expansion (a 6-D
                # broadcast whose (4, D=32) minor pair tiles at 4x lane
                # padding) and their reshapes never touch HBM — the
                # round-3 trace billed ~150 ms/step to that marshalling.
                from .mxu_gather import mxu_gather_weighted
                idxw = flat.transpose(0, 2, 1, 3)      # (B, H, Q, P)
                wts = cw.transpose(0, 2, 1, 3, 4)      # (B, H, Q, P, 4)
                acc = mxu_gather_weighted(
                    packed.reshape(B * H, sp, 4 * D),
                    idxw.reshape(B * H, Q, P),
                    wts.reshape(B * H, Q, P, 4))
                acc = acc.reshape(B, H, Q, 4 * D)
                out = out + sum(acc[..., c * D:(c + 1) * D]
                                for c in range(4))
                start += h * w
                continue
            from .mxu_gather import mxu_gather
            # all P points in one kernel call per level
            idx = flat.transpose(0, 2, 1, 3).reshape(B * H, Q * P)
            g = mxu_gather(packed.reshape(B * H, sp, 4 * D), idx)
            # keep the corner axis fused into the 4D=128 lane dim: a
            # (..., 4, D=32) minor pair tiles T(4,128) at 4x padding
            # (measured 1.56G for a 398M buffer in the B=8 OOM dump);
            # (..., 4D) rows tile exactly. Broadcast each corner weight
            # across its D-lane chunk, reduce P in-lane, fold corners
            # on the small per-(B,H,Q) result only.
            g = g.reshape(B, H, Q, P, 4 * D)
            wp = cw.transpose(0, 2, 1, 3, 4)           # (B, H, Q, P, 4)
            acc = (g * jnp.repeat(wp, D, axis=-1)).sum(axis=3)
            out = out + sum(acc[..., c * D:(c + 1) * D] for c in range(4))
        elif use_fwin:
            # segmented fused windows: queries are the concatenated raster
            # tokens of all levels; a tile of consecutive source-level
            # tokens maps to a narrow band of THIS level's rows, so each
            # segment gathers from per-tile static windows at MXU speed
            # (ops/fused_window.py). Segments whose window would exceed
            # sp // 3 (coarse sources spanning the whole map) and the
            # escape case fall back to the XLA weighted gather.
            from .fused_window import (fused_window_sample,
                                       segment_window_starts)
            tile_q = fwin_tile_q
            idxf = flat.transpose(0, 2, 1, 3).reshape(B * H, Q, P)
            cwf = cw.transpose(0, 2, 1, 3, 4).reshape(
                B * H, Q, P, 4).astype(jnp.float32)
            tbl = packed.reshape(B * H, sp, 4 * D)

            def xla_weighted(ops_):
                idx_s, w_s = ops_
                a = jnp.zeros(idx_s.shape[:2] + (4 * D,), dt)
                for p in range(P):
                    g = jnp.take_along_axis(
                        tbl, idx_s[:, :, p][..., None], axis=1)
                    a = a + g * jnp.repeat(
                        w_s[:, :, p].astype(dt), D, axis=-1)
                return a

            parts = []
            q0 = 0
            for (hs, ws_) in spatial_shapes:
                n = hs * ws_
                rows_per_tile = (tile_q / ws_) * (h / hs)
                need = int(rows_per_tile) + 2 * fwin_margin + 2
                k_seg = min(-(-(need * (w + 2)) // 16) * 16, sp)
                n_pad = -(-n // tile_q) * tile_q
                idx_s = idxf[:, q0:q0 + n]
                w_s = cwf[:, q0:q0 + n]
                if k_seg > sp // 2 or n < tile_q:
                    parts.append(xla_weighted((idx_s, w_s)))
                    q0 += n
                    continue
                starts = segment_window_starts(
                    n, tile_q, (hs, ws_), (h, w), sp, k_seg)
                starts_a = jnp.asarray(starts, jnp.int32)
                if n_pad > n:   # pad into the last tile's window
                    idx_s = jnp.pad(idx_s, ((0, 0), (0, n_pad - n),
                                            (0, 0)),
                                    constant_values=starts[-1])
                    w_s = jnp.pad(w_s, ((0, 0), (0, n_pad - n),
                                        (0, 0), (0, 0)))
                local = idx_s - jnp.repeat(starts_a, tile_q)[None, :,
                                                             None]
                in_win = ((local >= 0) & (local < k_seg)).all()
                seg = jax.lax.cond(
                    in_win,
                    lambda ops_: fused_window_sample(
                        tbl, ops_[0], ops_[1], starts_a, k_seg,
                        tile_q).astype(dt),
                    xla_weighted, (idx_s, w_s))
                parts.append(seg[:, :n])
                q0 += n
            acc = jnp.concatenate(parts, axis=1).reshape(B, H, Q, 4 * D)
            out = out + sum(acc[..., c * D:(c + 1) * D] for c in range(4))
        elif use_window:
            from .window_gather import tile_window_starts, window_gather
            tile_rows = window_tile_q * P
            starts = jnp.asarray(tile_window_starts(
                n0, window_tile_q, w, w + 2, sp, window_rows), jnp.int32)
            table = packed.reshape(B * H, sp, 4 * D)

            # level-0 queries (raster tokens [0, n0)): windowed MXU with
            # exactness fallback; remaining queries: XLA gather
            idx0 = flat[:, :n0].transpose(0, 2, 1, 3).reshape(
                B * H, n0 * P)                         # tile-major rows
            local = idx0.reshape(B * H, -1, tile_rows) - starts[None, :,
                                                                None]
            in_window = ((local >= 0) & (local < window_rows)).all()
            w0 = cw[:, :n0].transpose(0, 2, 1, 3, 4)   # (B, H, n0, P, 4)

            def via_window(op):
                table_, idx_ = op
                g = window_gather(table_, idx_, starts, tile_rows,
                                  window_rows)
                return g.reshape(B, H, n0, P, 4, D)

            def via_gather(op):
                table_, idx_ = op
                g = jnp.take_along_axis(
                    table_, idx_[..., None], axis=1)
                return g.reshape(B, H, n0, P, 4, D)

            g0 = jax.lax.cond(in_window, via_window, via_gather,
                              (table, idx0))
            acc0 = (g0 * w0[..., None]).sum(axis=(3, 4))   # (B, H, n0, D)

            if Q > n0:
                idxr = flat[:, n0:].transpose(0, 2, 1, 3).reshape(
                    B * H, (Q - n0) * P)
                gr = jnp.take_along_axis(table, idxr[..., None], axis=1)
                gr = gr.reshape(B, H, Q - n0, P, 4, D)
                wr = cw[:, n0:].transpose(0, 2, 1, 3, 4)
                accr = (gr * wr[..., None]).sum(axis=(3, 4))
                out = out + jnp.concatenate([acc0, accr], axis=2)
            else:
                out = out + acc0
        else:
            # level-0 XLA-gather path: accumulate in the packed 4D=128
            # lane layout (a (..., 4, D=32) minor pair tiles T(4,128) at
            # 4x padding; measured +9% step throughput from the same fix
            # on the MXU branch) and fold the corner chunks once per
            # level on the small (B, H, Q, 4D) accumulator.
            acc = jnp.zeros((B, H, Q, 4 * D), dt)
            for p in range(P):
                idx = flat[:, :, :, p].transpose(0, 2, 1)  # (B, H, Q)
                g = jnp.take_along_axis(packed, idx[..., None], axis=2)
                wp = cw[:, :, :, p].transpose(0, 2, 1, 3)  # (B, H, Q, 4)
                acc = acc + g * jnp.repeat(wp, D, axis=-1)
            out = out + sum(acc[..., c * D:(c + 1) * D] for c in range(4))
        start += h * w
    res = out.transpose(0, 2, 1, 3)
    if out_q is not None:
        res = res + out_q
    return res.reshape(B, Q, H * D)

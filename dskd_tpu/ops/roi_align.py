"""RoIAlign (parity: mmcv.ops.RoIAlign, aligned=True).

TPU-native formulation: per ROI bin, average ``sampling_ratio^2`` bilinear
samples from the NHWC feature map — expressed as one vectorized gather so
XLA maps it to its native gather; no per-ROI loops. Consumed by the
Faster R-CNN ROI head (single_level_roi_extractor parity). Border
semantics match the CUDA kernel exactly (tests/test_roi_align_oracle.py).

Conscious deviation: mmdet configs pass ``sampling_ratio=0`` (adaptive —
``ceil(roi_h / out_size)`` samples per bin, data-dependent), which cannot
be a static shape under jit; this implementation uses a FIXED ratio
(default 2, the value the adaptive rule yields for typical FPN-level ROI
sizes). Interior values converge to the same integral as the ratio grows.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def roi_align(feat: jnp.ndarray, rois: jnp.ndarray, out_size: int = 7,
              spatial_scale: float = 1.0, sampling_ratio: int = 2,
              aligned: bool = True) -> jnp.ndarray:
    """feat: (H, W, C) one image's level features. rois: (R, 4) xyxy in
    image coords. Returns (R, out_size, out_size, C)."""
    H, W, C = feat.shape
    R = rois.shape[0]
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * spatial_scale - offset
    y1 = rois[:, 1] * spatial_scale - offset
    x2 = rois[:, 2] * spatial_scale - offset
    y2 = rois[:, 3] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        # roi_align_cuda_kernel.cuh: legacy mode clamps to 1; aligned
        # mode uses the raw (possibly sub-pixel) extent
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size

    s = sampling_ratio
    # sample grid: (R, out, s) positions per axis
    iy = jnp.arange(out_size, dtype=feat.dtype)
    ss = (jnp.arange(s, dtype=feat.dtype) + 0.5) / s
    ys = (y1[:, None, None] + (iy[None, :, None] + ss[None, None, :])
          * bin_h[:, None, None])                          # (R, out, s)
    xs = (x1[:, None, None] + (iy[None, :, None] + ss[None, None, :])
          * bin_w[:, None, None])

    ys = ys.reshape(R, -1)                                  # (R, out*s)
    xs = xs.reshape(R, -1)

    def bilinear(yv, xv):
        """Gather (R, ny, nx, C) at all y-x combinations —
        bilinear_interpolate (roi_align_cuda_kernel.cuh) semantics: a
        sample is zero only outside [-1, H] x [-1, W]; inside that band
        the coordinate is CLAMPED to the map before the weights are
        computed, so border samples take the border row/col at full
        weight (they do not decay across the half-open edge band)."""
        my = ((yv >= -1.0) & (yv <= H)).astype(feat.dtype)
        mx = ((xv >= -1.0) & (xv <= W)).astype(feat.dtype)
        yc = jnp.clip(yv, 0.0, H - 1.0)
        xc = jnp.clip(xv, 0.0, W - 1.0)
        y0 = jnp.clip(jnp.floor(yc), 0.0, max(H - 2, 0))
        x0 = jnp.clip(jnp.floor(xc), 0.0, max(W - 2, 0))
        ty = (yc - y0)[:, :, None, None]
        tx = (xc - x0)[:, None, :, None]
        out = 0.0
        flat = feat.reshape(-1, C)
        for dy in (0, 1):
            for dx in (0, 1):
                yi = jnp.clip(y0 + dy, 0, H - 1).astype(jnp.int32)
                xi = jnp.clip(x0 + dx, 0, W - 1).astype(jnp.int32)
                idx = yi[:, :, None] * W + xi[:, None, :]   # (R, ny, nx)
                g = flat[idx.reshape(R, -1)].reshape(
                    R, yv.shape[1], xv.shape[1], C)
                wy = ty if dy else 1.0 - ty
                wx = tx if dx else 1.0 - tx
                out = out + g * wy * wx
        return out * my[:, :, None, None] * mx[:, None, :, None]

    sampled = bilinear(ys, xs)                # (R, out*s, out*s, C)
    sampled = sampled.reshape(R, out_size, s, out_size, s, C)
    return sampled.mean(axis=(2, 4))


def roi_align_own_map(maps: jnp.ndarray, rois: jnp.ndarray,
                      out_size: int, spatial_scale: float = 1.0,
                      sampling_ratio: int = 2) -> jnp.ndarray:
    """RoIAlign where ROI p samples its OWN single-channel map maps[p] —
    the mask-target crop (mask_rcnn.mask_targets et al).

    vmapping ``roi_align`` over (map, roi) pairs lowers to per-(roi,
    position) SCALAR gathers from the stacked (P, Hm*Wm) table — the
    measured mask_rcnn train-step hotspot (chip trace round 5: 4 corner
    fusions x 8.2 ms = 33 ms/step = 20% at B=2 800x1344). Bilinear
    sampling on a tensor-product grid is separable, so the same
    computation is two batched matmuls on the MXU:

        out[p] = Wy[p] @ maps[p] @ Wx[p]^T

    with Wy (P, out, Hm) / Wx (P, out, Wm) the per-axis interpolation
    weights (already averaged over the s sample sub-grid; the border
    band-mask and index clamps of ``bilinear_interpolate`` factor by
    axis). Bit-compared against the gather formulation in
    tests/test_roi_align_oracle.py."""
    P, Hm, Wm = maps.shape
    cf = jnp.float32
    rois = rois.astype(cf)
    x1 = rois[:, 0] * spatial_scale - 0.5
    y1 = rois[:, 1] * spatial_scale - 0.5
    bin_w = (rois[:, 2] * spatial_scale - 0.5 - x1) / out_size
    bin_h = (rois[:, 3] * spatial_scale - 0.5 - y1) / out_size

    s = sampling_ratio
    iy = jnp.arange(out_size, dtype=cf)
    ss = (jnp.arange(s, dtype=cf) + 0.5) / s
    grid = iy[None, :, None] + ss[None, None, :]            # (1, out, s)
    ys = (y1[:, None, None] + grid * bin_h[:, None, None]).reshape(P, -1)
    xs = (x1[:, None, None] + grid * bin_w[:, None, None]).reshape(P, -1)

    def axis_weights(vs, N):
        """(P, out*s) sample coords -> (P, out, N) averaged interp rows."""
        m = ((vs >= -1.0) & (vs <= N)).astype(cf)
        vc = jnp.clip(vs, 0.0, N - 1.0)
        v0 = jnp.clip(jnp.floor(vc), 0.0, max(N - 2, 0))
        t = vc - v0
        idx = jnp.arange(N, dtype=cf)
        w = ((idx == v0[..., None]) * (1.0 - t[..., None])
             + (idx == v0[..., None] + 1.0) * t[..., None]) * m[..., None]
        return w.reshape(P, out_size, s, N).mean(axis=2)

    wy = axis_weights(ys, Hm)                               # (P, out, Hm)
    wx = axis_weights(xs, Wm)                               # (P, out, Wm)
    tmp = jnp.einsum("poh,phw->pow", wy, maps.astype(cf))
    return jnp.einsum("pow,pqw->poq", tmp, wx)              # (P, out, out)


def _fused_multi_level(feats, rois, lvl, roi_valid, strides,
                       out_size: int, sampling_ratio: int = 2):
    """Pool each ROI ONLY at its assigned level via one gather over the
    concatenated all-level table.

    The masked-sum formulation below pools every ROI at every level and
    zeroes the three misses — 4x the gather traffic on what the chip
    trace shows is the two-stage bottleneck (XLA scalar-loop gathers).
    Here the per-level (H*W, C) tables are concatenated once (a
    contiguous HBM copy, cheap next to gathers) and each ROI's corner
    indices carry its level's base offset, so the gather volume is
    exactly 1x. Same arithmetic as roi_align at the ROI's own level —
    bit-compared in tests/test_roi_align_fused.py."""
    C = feats[0].shape[-1]
    R = rois.shape[0]
    dt = feats[0].dtype
    # coordinate / extent math stays f32 regardless of feat dtype:
    # bf16 cannot represent level extents like 339 exactly, which would
    # corrupt the border clamps and the gather index arithmetic
    cf = jnp.float32
    hs = np.array([f.shape[0] for f in feats])
    ws = np.array([f.shape[1] for f in feats])
    bases = np.concatenate([[0], np.cumsum(hs * ws)[:-1]])
    scale_arr = jnp.asarray(1.0 / np.asarray(strides), cf)
    h_arr = jnp.asarray(hs, cf)
    w_arr = jnp.asarray(ws, cf)
    wi_arr = jnp.asarray(ws, jnp.int32)
    base_arr = jnp.asarray(bases, jnp.int32)

    rois = rois.astype(cf)
    sc = scale_arr[lvl]                                     # (R,)
    Hr, Wr = h_arr[lvl], w_arr[lvl]
    x1 = rois[:, 0] * sc - 0.5
    y1 = rois[:, 1] * sc - 0.5
    bin_w = (rois[:, 2] * sc - 0.5 - x1) / out_size
    bin_h = (rois[:, 3] * sc - 0.5 - y1) / out_size

    s = sampling_ratio
    iy = jnp.arange(out_size, dtype=cf)
    ss = (jnp.arange(s, dtype=cf) + 0.5) / s
    grid = (iy[None, :, None] + ss[None, None, :])          # (1, out, s)
    ys = (y1[:, None, None] + grid * bin_h[:, None, None]).reshape(R, -1)
    xs = (x1[:, None, None] + grid * bin_w[:, None, None]).reshape(R, -1)

    # bilinear_interpolate border semantics (see roi_align above), with
    # per-ROI level extents
    my = ((ys >= -1.0) & (ys <= Hr[:, None])).astype(cf)
    mx = ((xs >= -1.0) & (xs <= Wr[:, None])).astype(cf)
    yc = jnp.clip(ys, 0.0, Hr[:, None] - 1.0)
    xc = jnp.clip(xs, 0.0, Wr[:, None] - 1.0)
    y0 = jnp.clip(jnp.floor(yc), 0.0, jnp.maximum(Hr - 2.0, 0.0)[:, None])
    x0 = jnp.clip(jnp.floor(xc), 0.0, jnp.maximum(Wr - 2.0, 0.0)[:, None])
    ty = (yc - y0)[:, :, None, None]
    tx = (xc - x0)[:, None, :, None]

    flat = jnp.concatenate([f.reshape(-1, C) for f in feats], axis=0)
    ns = ys.shape[1]
    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            yi = jnp.minimum(y0 + dy, Hr[:, None] - 1.0).astype(jnp.int32)
            xi = jnp.minimum(x0 + dx, Wr[:, None] - 1.0).astype(jnp.int32)
            idx = (base_arr[lvl][:, None, None]
                   + yi[:, :, None] * wi_arr[lvl][:, None, None]
                   + xi[:, None, :])                        # (R, ns, ns)
            g = flat[idx.reshape(R, -1)].reshape(R, ns, ns, C)
            wy = ty if dy else 1.0 - ty
            wx = tx if dx else 1.0 - tx
            # fold the f32 weights to the feature dtype at application so
            # bf16 features keep bf16 throughput
            out = out + g * (wy * wx).astype(dt)
    out = out * (my[:, :, None] * mx[:, None, :]).astype(dt)[..., None]
    out = out.reshape(R, out_size, s, out_size, s, C).mean(axis=(2, 4))
    return out * roi_valid[:, None, None, None]


def multi_level_roi_align(feats, rois, roi_valid, strides=(4, 8, 16, 32),
                          out_size: int = 7, finest_scale: int = 56,
                          level_rois=None):
    """SingleRoIExtractor parity: map each ROI to a level by its scale
    (level = floor(log2(sqrt(area)/56 + 1e-6)) clamped), extract there.

    feats: per-level (H, W, C) for ONE image. rois: (R, 4).
    ``level_rois``: when given, the LEVEL MAPPING uses these boxes while
    pooling uses ``rois`` — the reference maps levels before applying
    roi_scale_factor (single_level_roi_extractor.py forward)."""
    lr = rois if level_rois is None else level_rois
    w = lr[:, 2] - lr[:, 0]
    h = lr[:, 3] - lr[:, 1]
    scale = jnp.sqrt(jnp.clip(w * h, 1e-6, None))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, len(feats) - 1).astype(jnp.int32)

    if (len({f.shape[-1] for f in feats}) == 1
            and os.environ.get("DSKD_ROI_FUSED", "1") == "1"):
        return _fused_multi_level(feats, rois, lvl, roi_valid,
                                  strides[:len(feats)], out_size)

    out = 0.0
    for i, f in enumerate(feats):
        o = roi_align(f, rois, out_size, spatial_scale=1.0 / strides[i])
        out = out + jnp.where((lvl == i)[:, None, None, None], o, 0.0)
    return out * roi_valid[:, None, None, None]


def all_level_roi_align(feats, rois, roi_valid, strides=(4, 8, 16, 32),
                        out_size: int = 7):
    """GenericRoIExtractor support (generic_roi_extractor.py:46-86,
    configs/groie): extract EVERY level for every ROI — the caller's
    pre/post modules aggregate. Returns (R, L, out, out, C) for one
    image."""
    per = [roi_align(f, rois, out_size, spatial_scale=1.0 / s_)
           for f, s_ in zip(feats, strides)]
    out = jnp.stack(per, axis=1)                  # (R, L, o, o, C)
    return out * roi_valid[:, None, None, None, None]

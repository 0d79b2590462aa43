"""RoIAlign vs an exact restatement of the mmcv CUDA kernel.

Oracle: mmcv/ops/csrc/common/cuda/roi_align_cuda_kernel.cuh
``bilinear_interpolate`` + ``roi_align_forward_cuda_kernel`` semantics
(aligned=True, fixed sampling_ratio), looped in numpy:
  * a sample is ZERO only outside [-1, H] x [-1, W];
  * inside that band the coordinate is CLAMPED to [0, H-1] before the
    bilinear weights are computed (border samples take the border row/col
    at full weight — they do not decay);
  * per bin, average sampling_ratio^2 samples.
The golden-geometry tests (test_faster_rcnn.py) pin interior behavior;
this file pins the border/edge-box contract the ROI head sees for boxes
touching the image boundary.
"""
import numpy as np
import jax.numpy as jnp

from dskd_tpu.ops.roi_align import roi_align


def _bilinear_mmcv(feat, y, x):
    """feat: (H, W, C). One sample, mmcv bilinear_interpolate semantics."""
    H, W, _ = feat.shape
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros(feat.shape[-1], feat.dtype)
    y = min(max(y, 0.0), H - 1.0) if y > 0 else 0.0
    x = min(max(x, 0.0), W - 1.0) if x > 0 else 0.0
    y_low = int(y)
    x_low = int(x)
    if y_low >= H - 1:
        y_high = y_low = H - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= W - 1:
        x_high = x_low = W - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx
    return (hy * hx * feat[y_low, x_low] + hy * lx * feat[y_low, x_high]
            + ly * hx * feat[y_high, x_low]
            + ly * lx * feat[y_high, x_high])


def _roi_align_mmcv(feat, rois, out_size, spatial_scale, sampling_ratio):
    H, W, C = feat.shape
    R = rois.shape[0]
    out = np.zeros((R, out_size, out_size, C), np.float64)
    for r in range(R):
        x1, y1, x2, y2 = rois[r] * spatial_scale - 0.5
        roi_w = x2 - x1
        roi_h = y2 - y1
        bin_w = roi_w / out_size
        bin_h = roi_h / out_size
        s = sampling_ratio
        for py in range(out_size):
            for px in range(out_size):
                acc = np.zeros(C, np.float64)
                for iy in range(s):
                    yy = y1 + py * bin_h + (iy + 0.5) * bin_h / s
                    for ix in range(s):
                        xx = x1 + px * bin_w + (ix + 0.5) * bin_w / s
                        acc += _bilinear_mmcv(feat, yy, xx)
                out[r, py, px] = acc / (s * s)
    return out


def test_roi_align_matches_mmcv_kernel_interior_and_edges():
    rng = np.random.RandomState(0)
    H, W, C = 12, 10, 3
    feat = rng.randn(H, W, C).astype(np.float32)
    # interior boxes, boxes flush to every border, boxes hanging off the
    # map (negative / past-edge coords after the 0.5 align offset), and a
    # sub-pixel box
    rois = np.array([
        [8.0, 4.0, 30.0, 40.0],
        [0.0, 0.0, 40.0, 48.0],       # full image
        [0.0, 0.0, 6.0, 6.0],         # flush to the top-left corner
        [30.0, 40.0, 40.0, 48.0],     # flush to the bottom-right corner
        [-6.0, -8.0, 10.0, 12.0],     # hangs off the top-left
        [34.0, 44.0, 52.0, 60.0],     # hangs off the bottom-right
        [3.0, 5.0, 3.4, 5.4],         # sub-pixel
    ], np.float32)
    for scale, s in ((0.25, 2), (0.25, 1), (0.5, 3)):
        want = _roi_align_mmcv(feat, rois, 7, scale, s)
        got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                   out_size=7, spatial_scale=scale,
                                   sampling_ratio=s))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5,
                                   err_msg=f"scale={scale} ratio={s}")


def test_own_map_matmul_matches_gather_formulation():
    """roi_align_own_map (separable batched-matmul mask-target crop)
    must reproduce the vmapped-gather roi_align exactly (same sample
    grid, same border band/clamps) — PERF.md finding 17."""
    import jax
    import jax.numpy as jnp

    from dskd_tpu.ops.roi_align import roi_align, roi_align_own_map

    rng = np.random.RandomState(0)
    P, Hm, Wm = 13, 37, 53
    maps = (rng.rand(P, Hm, Wm) > 0.5).astype(np.float32)
    # boxes in image coords at stride 4, incl. degenerate/border cases
    xy = rng.rand(P, 2).astype(np.float32) * 150 - 10
    wh = rng.rand(P, 2).astype(np.float32) * 120 + 1
    rois = np.concatenate([xy, xy + wh], -1)
    rois[0] = [-20, -20, -15, -15]          # fully outside band
    rois[1] = [0, 0, 4 * Wm, 4 * Hm]        # whole map
    rois[2] = [3, 3, 3.4, 3.6]              # sub-pixel

    def one(m, r):
        return roi_align(m[..., None], r[None], out_size=14,
                         spatial_scale=0.25)[0, :, :, 0]

    ref = jax.vmap(one)(jnp.asarray(maps), jnp.asarray(rois))
    got = roi_align_own_map(jnp.asarray(maps), jnp.asarray(rois),
                            out_size=14, spatial_scale=0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

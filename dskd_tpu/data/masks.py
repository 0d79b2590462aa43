"""Instance-mask structures (parity: mmdet core/mask/structures.py
BitmapMasks/PolygonMasks + the vendored pycocotools mask.py RLE codec +
core/mask/mask_target.py's bitmap conversion).

Dependency-free numpy implementations (pycocotools is not vendored
here): COCO polygon rasterization by scanline ray casting at pixel
centers, uncompressed + LEB128-compressed RLE decode, and the
annotation->padded-batch-bitmap conversion the Mask R-CNN family
consumes (models/mask_rcnn.py)."""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def polygon_to_bitmap(polygons: Sequence[Sequence[float]], h: int,
                      w: int) -> np.ndarray:
    """COCO polygon list [[x0,y0,x1,y1,...], ...] -> (h, w) bool bitmap.

    Even-odd fill evaluated at pixel centers (x+0.5, y+0.5): a center is
    inside when an upward ray-cast parity is odd, accumulated over all
    polygon parts (matches pycocotools frPyObjects+decode up to half-pixel
    boundary rounding)."""
    count = np.zeros((h, w), np.int32)
    yc = np.arange(h, dtype=np.float64) + 0.5
    xc = np.arange(w, dtype=np.float64) + 0.5
    for poly in polygons:
        p = np.asarray(poly, np.float64).reshape(-1, 2)
        if p.shape[0] < 3:
            continue
        x0, y0 = p[:, 0], p[:, 1]
        x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
        # edge e crosses row y when min(y0,y1) <= y < max(y0,y1)
        lo = np.minimum(y0, y1)[:, None]
        hi = np.maximum(y0, y1)[:, None]
        crosses = (yc[None, :] >= lo) & (yc[None, :] < hi)   # (E, h)
        dy = np.where(y1 - y0 == 0, 1.0, y1 - y0)
        t = (yc[None, :] - y0[:, None]) / dy[:, None]
        xint = x0[:, None] + t * (x1 - x0)[:, None]          # (E, h)
        xint = np.where(crosses, xint, -np.inf)
        # parity of crossings strictly right of the pixel center
        count += (xint[:, :, None] > xc[None, None, :]).sum(0)
    return (count % 2) == 1


def rle_decode_uncompressed(counts: Sequence[int], h: int,
                            w: int) -> np.ndarray:
    """COCO uncompressed RLE (column-major run lengths, zeros first) ->
    (h, w) bool."""
    flat = np.zeros(h * w, bool)
    pos, val = 0, False
    for c in counts:
        flat[pos:pos + int(c)] = val
        pos += int(c)
        val = not val
    return flat.reshape(w, h).T          # F order


def rle_encode_uncompressed(bm: np.ndarray) -> Dict:
    """(h, w) bool -> COCO uncompressed RLE dict (column-major runs,
    zeros first) — the inverse of rle_decode_uncompressed."""
    h, w = bm.shape
    flat = np.asarray(bm, bool).T.reshape(-1)       # F order
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(bounds).tolist()
    if flat.size and flat[0]:                       # must start with a 0-run
        counts = [0] + counts
    return {"counts": counts, "size": [h, w]}


def rle_string_to_counts(s) -> List[int]:
    """pycocotools compressed RLE string -> run-length ints (mask.c
    rleFrString: 6-bit chunks, bit 5 = continuation, sign-extension via
    bit 4 of the last chunk, and counts[i] += counts[i-2] for i > 1)."""
    if isinstance(s, str):
        s = s.encode()
    cnts: List[int] = []
    p = 0
    while p < len(s):
        x, k, more = 0, 0, True
        while more:
            c = s[p] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    return cnts


def rle_decode(rle: Dict, h: int, w: int) -> np.ndarray:
    """COCO 'segmentation' RLE dict (compressed string or uncompressed
    list) -> (h, w) bool."""
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = rle_string_to_counts(counts)
    return rle_decode_uncompressed(counts, h, w)


def ann_to_bitmap(segmentation, h: int, w: int) -> np.ndarray:
    """Any COCO 'segmentation' payload (polygon list or RLE dict) ->
    (h, w) bool."""
    if isinstance(segmentation, dict):
        return rle_decode(segmentation, segmentation.get("size", [h, w])[0],
                          segmentation.get("size", [h, w])[1])
    return polygon_to_bitmap(segmentation, h, w)


def paste_masks_np(masks: np.ndarray, boxes: np.ndarray, out_hw,
                   thr: float = 0.5) -> np.ndarray:
    """Host-side mirror of models/mask_rcnn.py paste_masks (mmdet
    _do_paste_mask): (R, 28, 28) probs + (R, 4) xyxy boxes -> (R, H, W)
    bool pasted instance masks. Used by the evaluator to expand per-det
    mask grids to original image size before segm matching."""
    H, W = int(out_hw[0]), int(out_hw[1])
    R, S, _ = masks.shape
    out = np.zeros((R, H, W), bool)
    ys = np.arange(H, dtype=np.float64) + 0.5
    xs = np.arange(W, dtype=np.float64) + 0.5
    for r in range(R):
        x1, y1, x2, y2 = boxes[r]
        bw, bh = max(x2 - x1, 1e-3), max(y2 - y1, 1e-3)
        # only pixels inside the box can be set — restrict the sample grid
        yi = np.where((ys >= y1) & (ys <= y2))[0]
        xi = np.where((xs >= x1) & (xs <= x2))[0]
        if len(yi) == 0 or len(xi) == 0:
            continue
        gy = (ys[yi] - y1) / bh * S - 0.5
        gx = (xs[xi] - x1) / bw * S - 0.5
        y0 = np.clip(np.floor(gy), 0, S - 1).astype(np.int64)
        x0 = np.clip(np.floor(gx), 0, S - 1).astype(np.int64)
        ty = np.clip(gy - y0, 0.0, 1.0)
        tx = np.clip(gx - x0, 0.0, 1.0)
        y1i = np.minimum(y0 + 1, S - 1)
        x1i = np.minimum(x0 + 1, S - 1)
        m = masks[r].astype(np.float64)
        v = (m[np.ix_(y0, x0)] * (1 - ty)[:, None] * (1 - tx)[None]
             + m[np.ix_(y0, x1i)] * (1 - ty)[:, None] * tx[None]
             + m[np.ix_(y1i, x0)] * ty[:, None] * (1 - tx)[None]
             + m[np.ix_(y1i, x1i)] * ty[:, None] * tx[None])
        out[r][np.ix_(yi, xi)] = v >= thr
    return out


def canvas_to_source_grid(canvas_hw, stride: int, src_hw, scale,
                          crop_offset=(0, 0), valid_hw=None, flip=False):
    """Shared inverse-geometry grid for rasterized GT payloads: map the
    strided canvas grid back through (crop <- resize <- [flip]) to source
    pixel indices. Returns (ys, xs, valid_y, valid_x); ``flip`` only
    affects how the caller should index (the source is flipped BEFORE
    resize in this pipeline, so flip is applied to the source array, not
    the grid) — accepted here so both consumers share one signature."""
    Hc, Wc = canvas_hw
    hs, ws = Hc // stride, Wc // stride
    oh, ow = src_hw
    sy, sx = (scale if isinstance(scale, (tuple, list, np.ndarray))
              else (scale, scale))
    top, left = crop_offset
    vh, vw = (valid_hw if valid_hw is not None else (oh * sy, ow * sx))
    ys = np.clip((np.arange(hs) * stride + stride / 2 + top) / sy,
                 0, oh - 1).astype(np.int64)
    xs = np.clip((np.arange(ws) * stride + stride / 2 + left) / sx,
                 0, ow - 1).astype(np.int64)
    valid_y = (np.arange(hs) * stride) < vh
    valid_x = (np.arange(ws) * stride) < vw
    return ys, xs, valid_y, valid_x


def batch_gt_masks(segmentations, orig_hw, scale, canvas_hw, max_gt: int,
                   mask_stride: int = 4, flip: bool = False,
                   crop_offset=(0, 0), valid_hw=None) -> np.ndarray:
    """Rasterize one image's GT segmentations into the padded batch
    layout models/mask_rcnn.py trains on: (max_gt, H/stride, W/stride)
    float32, resized by the same ``scale`` the image pipeline applied and
    placed on the padded canvas.

    ``scale`` may be a scalar or an (sy, sx) pair (mmdet Resize keeps
    w_scale/h_scale separately; they differ by int rounding).

    Uses nearest-neighbor subsampling at mask_stride (mmdet rescales the
    full bitmap; at stride 4 vs a 28x28 target the difference is
    sub-pixel).

    ``crop_offset`` = (top, left) of a RandomCrop applied AFTER the
    resize (the LSJ recipe): the canvas grid shifts by it before the
    inverse scale. ``valid_hw`` bounds the live region on the canvas
    (defaults to the resized full image; pass the post-crop img_hw when
    cropping)."""
    Hc, Wc = canvas_hw
    hs, ws = Hc // mask_stride, Wc // mask_stride
    out = np.zeros((max_gt, hs, ws), np.float32)
    oh, ow = orig_hw
    ys, xs, valid_y, valid_x = canvas_to_source_grid(
        canvas_hw, mask_stride, orig_hw, scale, crop_offset, valid_hw)
    for i, seg in enumerate(segmentations[:max_gt]):
        if seg is None:
            continue
        bm = ann_to_bitmap(seg, oh, ow)
        if flip:
            bm = bm[:, ::-1]
        out[i] = (bm[ys][:, xs] & valid_y[:, None]
                  & valid_x[None, :]).astype(np.float32)
    return out

"""Common-corruptions for robustness benchmarking (numpy/cv2, host-side).

Parity target: the reference's `Corrupt` pipeline transform
(mmdet/datasets/pipelines/transforms.py, backed by the external
`imagecorruptions` package) used by tools/analysis_tools/test_robustness.py.
This vendors TPU-framework-native implementations of the benchmark's most
common corruption families with the standard 5-severity parameter ladders
(Hendrycks & Dietterich, ICLR'19 — public constants). Images are float RGB
in [0, 255]; outputs are clipped back to [0, 255].
"""
from __future__ import annotations

import numpy as np

_SEV = {
    "gaussian_noise": [0.04, 0.06, 0.08, 0.09, 0.10],
    "shot_noise": [500, 250, 100, 75, 50],
    "impulse_noise": [0.01, 0.02, 0.03, 0.05, 0.07],
    "gaussian_blur": [1, 2, 3, 4, 6],
    "motion_blur": [(6, 1), (10, 1.5), (10, 2), (12, 2.5), (14, 3)],
    "brightness": [0.1, 0.2, 0.3, 0.4, 0.5],
    "contrast": [0.75, 0.5, 0.4, 0.3, 0.15],
    "pixelate": [0.95, 0.9, 0.85, 0.75, 0.65],
    "jpeg_compression": [80, 65, 58, 50, 40],
}

CORRUPTIONS = tuple(_SEV)


def corrupt(img: np.ndarray, name: str, severity: int,
            seed: int = 0) -> np.ndarray:
    """Apply ``name`` at ``severity`` in [1, 5] to an RGB [0,255] image."""
    import cv2

    assert 1 <= severity <= 5, severity
    p = _SEV[name][severity - 1]
    rng = np.random.RandomState(seed)
    x = img.astype(np.float32) / 255.0
    if name == "gaussian_noise":
        x = x + rng.normal(size=x.shape, scale=p)
    elif name == "shot_noise":
        x = rng.poisson(np.clip(x, 0, 1) * p) / float(p)
    elif name == "impulse_noise":
        m = rng.rand(*x.shape[:2])
        x[m < p / 2] = 0.0
        x[m > 1 - p / 2] = 1.0
    elif name == "gaussian_blur":
        k = int(2 * np.ceil(2 * p) + 1)
        x = cv2.GaussianBlur(x, (k, k), p)
    elif name == "motion_blur":
        size, _ = int(p[0]), p[1]
        kern = np.zeros((size, size), np.float32)
        kern[size // 2, :] = 1.0 / size       # horizontal streak
        x = cv2.filter2D(x, -1, kern)
    elif name == "brightness":
        x = x + p
    elif name == "contrast":
        x = (x - x.mean(axis=(0, 1), keepdims=True)) * p + \
            x.mean(axis=(0, 1), keepdims=True)
    elif name == "pixelate":
        h, w = x.shape[:2]
        dh, dw = max(int(h * p), 1), max(int(w * p), 1)
        x = cv2.resize(cv2.resize(x, (dw, dh),
                                  interpolation=cv2.INTER_AREA),
                       (w, h), interpolation=cv2.INTER_NEAREST)
    elif name == "jpeg_compression":
        u8 = np.clip(x * 255.0, 0, 255).astype(np.uint8)
        ok, enc = cv2.imencode(
            ".jpg", cv2.cvtColor(u8, cv2.COLOR_RGB2BGR),
            [int(cv2.IMWRITE_JPEG_QUALITY), int(p)])
        assert ok
        x = cv2.cvtColor(cv2.imdecode(enc, cv2.IMREAD_COLOR),
                         cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    else:
        raise ValueError(f"unknown corruption {name!r}")
    return np.clip(x, 0, 1) * 255.0

"""Common-corruptions for robustness benchmarking (numpy/cv2, host-side).

Parity target: the reference's `Corrupt` pipeline transform
(mmdet/datasets/pipelines/transforms.py, backed by the external
`imagecorruptions` package) used by tools/analysis_tools/test_robustness.py.
This vendors TPU-framework-native implementations of the benchmark's most
common corruption families using the imagecorruptions package's published
5-severity parameter tables verbatim (Hendrycks & Dietterich, ICLR'19), so
mPC numbers are comparable to published robustness results for these
families. Two approximations: motion_blur uses a straight-streak kernel of
the published (radius, sigma) instead of ImageMagick's random-angle motion
kernel, and brightness adds in RGB rather than HSV-V space — those two
families are only internally comparable. Images are float RGB in [0, 255];
outputs are clipped back to [0, 255].
"""
from __future__ import annotations

import numpy as np

# imagecorruptions severity tables (corruptions.py of that package), verbatim
_SEV = {
    "gaussian_noise": [0.08, 0.12, 0.18, 0.26, 0.38],
    "shot_noise": [60, 25, 12, 5, 3],
    "impulse_noise": [0.03, 0.06, 0.09, 0.17, 0.27],
    "gaussian_blur": [1, 2, 3, 4, 6],
    "motion_blur": [(10, 3), (15, 5), (15, 8), (15, 12), (20, 15)],
    "brightness": [0.1, 0.2, 0.3, 0.4, 0.5],
    "contrast": [0.4, 0.3, 0.2, 0.1, 0.05],
    "pixelate": [0.6, 0.5, 0.4, 0.3, 0.25],
    "jpeg_compression": [25, 18, 15, 10, 7],
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

#!/usr/bin/env python
"""Tile images into one canvas (parity: tools/misc_my/stich_imgs.py — the
reference's grid compositor used by its augmentation checkers)."""
import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def stich_many_imgs(images, scale: float = 1.0, cols: int = 0):
    """images: list of HxWx3 uint8 arrays (any sizes) -> one grid canvas.

    Each tile is letterboxed to the max cell size, optionally scaled."""
    import cv2

    n = len(images)
    assert n > 0
    cols = cols or int(math.ceil(math.sqrt(n)))
    rows = int(math.ceil(n / cols))
    ch = max(im.shape[0] for im in images)
    cw = max(im.shape[1] for im in images)
    canvas = np.zeros((rows * ch, cols * cw, 3), np.uint8)
    for i, im in enumerate(images):
        r, c = divmod(i, cols)
        canvas[r * ch:r * ch + im.shape[0],
               c * cw:c * cw + im.shape[1]] = im
    if scale != 1.0:
        canvas = cv2.resize(canvas, (int(canvas.shape[1] * scale),
                                     int(canvas.shape[0] * scale)))
    return canvas


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("images", nargs="+")
    parser.add_argument("--scale", type=float, default=1.0)
    parser.add_argument("--cols", type=int, default=0)
    parser.add_argument("--out", default="stiched.jpg")
    args = parser.parse_args()
    import cv2

    imgs = [cv2.imread(p) for p in args.images]
    cv2.imwrite(args.out, stich_many_imgs(imgs, args.scale, args.cols))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

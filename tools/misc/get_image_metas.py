#!/usr/bin/env python
"""Collect per-image metas (filename, ori_shape) from a COCO annotation
file into a json — the reference's tools/misc/get_image_metas.py (which
pre-computes metas so test-time dataloading can skip image decoding).

Usage: python tools/misc/get_image_metas.py ANN.json [--img-prefix DIR]
       [--out metas.json] [--decode]  (--decode reads each file to verify
       the recorded width/height instead of trusting the annotations)
"""
import argparse
import json
import os


def collect(ann_file, img_prefix=None, decode=False):
    with open(ann_file) as f:
        ann = json.load(f)
    metas = []
    for im in ann["images"]:
        h, w = im.get("height"), im.get("width")
        if decode:
            import cv2
            path = os.path.join(img_prefix or "", im["file_name"])
            arr = cv2.imread(path)
            assert arr is not None, path
            h, w = arr.shape[:2]
        metas.append({"filename": im["file_name"],
                      "ori_shape": [h, w, 3]})
    return metas


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ann")
    p.add_argument("--img-prefix", default=None)
    p.add_argument("--out", default="image_metas.json")
    p.add_argument("--decode", action="store_true")
    args = p.parse_args()
    metas = collect(args.ann, args.img_prefix, args.decode)
    with open(args.out, "w") as f:
        json.dump(metas, f)
    print(f"wrote {len(metas)} metas to {args.out}")


if __name__ == "__main__":
    main()

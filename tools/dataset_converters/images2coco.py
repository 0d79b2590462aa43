#!/usr/bin/env python
"""Build an (unannotated) COCO-format json from a directory of images.

Parity: tools/dataset_converters/images2coco.py — used to run inference
over raw image folders through the COCO-format data path.

Usage: python tools/dataset_converters/images2coco.py IMG_DIR CLASSES OUT \
    [--exclude-extensions ...]
"""
import argparse
import json
import os


def collect_images(img_dir, exclude=()):
    exts = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff", ".webp"}
    out = []
    for name in sorted(os.listdir(img_dir)):
        ext = os.path.splitext(name)[1].lower()
        if ext in exts and ext not in exclude:
            out.append(name)
    return out


def images2coco(img_dir, classes, out_file, exclude=()):
    try:
        import cv2
    except ImportError:
        cv2 = None
    images = []
    for i, name in enumerate(collect_images(img_dir, exclude)):
        h = w = None
        if cv2 is not None:
            img = cv2.imread(os.path.join(img_dir, name))
            if img is not None:
                h, w = img.shape[:2]
        images.append(dict(id=i + 1, file_name=name,
                           width=w or 0, height=h or 0))
    categories = [dict(id=i + 1, name=c) for i, c in enumerate(classes)]
    ann = dict(images=images, annotations=[], categories=categories)
    with open(out_file, "w") as f:
        json.dump(ann, f)
    return len(images)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("img_dir")
    parser.add_argument("classes", help="text file: one class name per line")
    parser.add_argument("out")
    parser.add_argument("--exclude-extensions", nargs="*", default=[])
    args = parser.parse_args()
    with open(args.classes) as f:
        classes = [l.strip() for l in f if l.strip()]
    n = images2coco(args.img_dir, classes, args.out,
                    tuple(args.exclude_extensions))
    print(f"wrote {n} images to {args.out}")


if __name__ == "__main__":
    main()

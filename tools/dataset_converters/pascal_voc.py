#!/usr/bin/env python
"""Convert PASCAL VOC XML annotations to COCO-format json.

Parity: tools/dataset_converters/pascal_voc.py — VOC devkit -> COCO json so
the COCO-format data path (and the x-class split machinery) can train on
VOC.

Usage: python tools/dataset_converters/pascal_voc.py DEVKIT_ROOT OUT_DIR \
    [--splits trainval test] [--years 2007 2012]
"""
import argparse
import json
import os
import xml.etree.ElementTree as ET

VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor")


def parse_xml(path, cat2id):
    root = ET.parse(path).getroot()
    size = root.find("size")
    w = int(size.find("width").text)
    h = int(size.find("height").text)
    anns = []
    for obj in root.findall("object"):
        name = obj.find("name").text.strip().lower()
        if name not in cat2id:
            continue
        difficult = int((obj.find("difficult").text or 0)
                        if obj.find("difficult") is not None else 0)
        box = obj.find("bndbox")
        # VOC is 1-indexed inclusive
        x1 = float(box.find("xmin").text) - 1
        y1 = float(box.find("ymin").text) - 1
        x2 = float(box.find("xmax").text)
        y2 = float(box.find("ymax").text)
        anns.append(dict(category_id=cat2id[name],
                         bbox=[x1, y1, x2 - x1, y2 - y1],
                         area=(x2 - x1) * (y2 - y1),
                         iscrowd=0, ignore=difficult,
                         difficult=difficult))
    return w, h, anns


def voc_split_to_coco(devkit, year, split, out_file):
    cat2id = {c: i + 1 for i, c in enumerate(VOC_CLASSES)}
    vocdir = os.path.join(devkit, f"VOC{year}")
    ids_file = os.path.join(vocdir, "ImageSets", "Main", f"{split}.txt")
    with open(ids_file) as f:
        ids = [l.strip() for l in f if l.strip()]

    images, annotations = [], []
    aid = 1
    for i, img_id in enumerate(ids):
        xml = os.path.join(vocdir, "Annotations", f"{img_id}.xml")
        w, h, anns = parse_xml(xml, cat2id)
        images.append(dict(id=i + 1,
                           file_name=f"VOC{year}/JPEGImages/{img_id}.jpg",
                           width=w, height=h))
        for a in anns:
            a = dict(a, id=aid, image_id=i + 1)
            aid += 1
            annotations.append(a)
    cats = [dict(id=v, name=k) for k, v in cat2id.items()]
    with open(out_file, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=cats), f)
    return len(images), len(annotations)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("devkit")
    parser.add_argument("out_dir")
    parser.add_argument("--splits", nargs="*", default=["trainval", "test"])
    parser.add_argument("--years", nargs="*", default=["2007"])
    args = parser.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    for year in args.years:
        for split in args.splits:
            out = os.path.join(args.out_dir, f"voc{year}_{split}.json")
            n_img, n_ann = voc_split_to_coco(args.devkit, year, split, out)
            print(f"voc{year} {split}: {n_img} images, {n_ann} anns -> "
                  f"{out}")


if __name__ == "__main__":
    main()

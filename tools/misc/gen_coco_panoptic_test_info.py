#!/usr/bin/env python
"""Generate COCO test image info for panoptic segmentation (parity:
tools/misc/gen_coco_panoptic_test_info.py): the test-dev image-info json
lacks the `isthing` attribute on categories, so replace its category
table with the one from panoptic_val2017.json."""
import argparse
import json
import os.path as osp


def main():
    parser = argparse.ArgumentParser(
        description="Generate COCO test image information for COCO "
        "panoptic segmentation.")
    parser.add_argument("data_root",
                        help="Path to COCO annotation directory.")
    args = parser.parse_args()

    with open(osp.join(args.data_root, "panoptic_val2017.json")) as f:
        val_info = json.load(f)
    with open(osp.join(args.data_root,
                       "image_info_test-dev2017.json")) as f:
        test_info = json.load(f)

    test_info["categories"] = val_info["categories"]
    out = osp.join(args.data_root,
                   "panoptic_image_info_test-dev2017.json")
    with open(out, "w") as f:
        json.dump(test_info, f)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

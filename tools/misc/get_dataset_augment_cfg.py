#!/usr/bin/env python
"""Resolve a config's dataset + augmentation setup (parity:
tools/misc_my/get_dataset_augment_cfg.py — the reference's helper that
hands its sibling debug scripts a dataset and transform; its hardcoded
private paths become the config's own data section here).

Importable surface for the other tools/misc scripts:
  get_dataset(cfg_path, trainval, task) -> TaskCocoDataset
  get_transform(cfg_path)              -> PipelineConfig
Run directly, prints both resolved objects.
"""
import argparse


def get_dataset(cfg_path: str, trainval: str = "val", task: int = None):
    from dskd_tpu.train.incremental import make_datasets
    from dskd_tpu.utils.config import load_config

    cfg = load_config(cfg_path)
    task_nums = len(cfg.data.catsplit)
    tid = task or task_nums
    train_ds, val_ds = make_datasets(cfg, tid, task_nums)
    return train_ds if trainval == "train" else val_ds


def get_transform(cfg_path: str):
    from dskd_tpu.data.pipeline import PipelineConfig
    from dskd_tpu.utils.config import load_config

    cfg = load_config(cfg_path)
    return PipelineConfig(img_scale=cfg.data.img_scale,
                          flip_ratio=cfg.data.flip_ratio,
                          max_gt=cfg.data.max_gt,
                          bucket=cfg.data.bucket)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("--trainval", default="val",
                   choices=("train", "val"))
    p.add_argument("--task", type=int, default=None)
    args = p.parse_args()

    ds = get_dataset(args.config, args.trainval, args.task)
    pipe = get_transform(args.config)
    print(f"dataset: {type(ds).__name__} len={len(ds)} "
          f"classes={len(ds.CLASSES)}")
    print(f"  LOAD={len(ds.LOAD_CLASSES)} PRED={len(ds.PRED_CLASSES)}")
    print(f"transform: {pipe}")


if __name__ == "__main__":
    main()

"""Import an mmdet config file into a dskd_tpu ExperimentConfig.

Loads the mmdet python config (resolving ``_base_`` inheritance with the
mmcv merge rules), maps it onto the typed ExperimentConfig, prints the
translation, and optionally writes a ready-to-train dskd_tpu config
module. Every mmdet key the rebuild does not carry is listed so the
migration is explicit, not silent.

Usage:
  python tools/misc/import_mmdet_config.py MMDET_CONFIG.py [-o out.py]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import pprint
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def emit_module(exp, src: str) -> str:
    d = dataclasses.asdict(exp)
    body = pprint.pformat(d, width=72).replace("\n", "\n    ")
    return (
        f'"""Imported from {src} (tools/misc/import_mmdet_config.py)."""\n'
        "from dskd_tpu.utils.config import (DataConfig, DistillFlags,\n"
        "                                   ExperimentConfig, ModelConfig,\n"
        "                                   TrainConfig)\n\n\n"
        "def get_config() -> ExperimentConfig:\n"
        f"    d = {body}\n"
        "    cfg = ExperimentConfig(\n"
        "        model=ModelConfig(**d.pop('model')),\n"
        "        data=DataConfig(**d.pop('data')),\n"
        "        train=TrainConfig(**d.pop('train')),\n"
        "        distill=DistillFlags(**d.pop('distill')),\n"
        "    )\n"
        "    for k, v in d.items():\n"
        "        setattr(cfg, k, v)\n"
        "    return cfg\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="mmdet python config file")
    ap.add_argument("-o", "--out", default=None,
                    help="write a dskd_tpu config module here")
    args = ap.parse_args()

    from dskd_tpu.utils.mmdet_config import (load_mmdet_config,
                                             mmdet_to_experiment)
    cfg = load_mmdet_config(args.config)
    exp, ignored = mmdet_to_experiment(cfg)

    print("== ExperimentConfig ==")
    pprint.pprint(dataclasses.asdict(exp))
    if ignored:
        print("\n== not carried over (check manually) ==")
        for k in ignored:
            print(f"  - {k}")
    if not exp.model.arch:
        print("\nERROR: no family mapping for this model type",
              file=sys.stderr)
        sys.exit(1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(emit_module(exp, args.config))
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()

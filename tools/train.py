#!/usr/bin/env python
"""Standard single-task training CLI (the reference's tools/train.py).

Trains the detector on the full class set (catsplit=(num_classes,)) with no
teacher — shares all machinery with the incremental driver.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import argparse
import logging


def main():
    parser = argparse.ArgumentParser(description="DSKD-TPU train")
    parser.add_argument("config")
    parser.add_argument("--work-dir", default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--set", nargs="*", default=[])
    parser.add_argument("--launcher", choices=["none", "dist"],
                        default="none")
    args = parser.parse_args()

    from dskd_tpu.train.incremental import run_incremental
    from dskd_tpu.utils.config import apply_overrides, load_config

    if args.launcher == "dist":
        import os

        from dskd_tpu.parallel.mesh import init_distributed
        init_distributed(
            coordinator=os.environ.get("DSKD_COORDINATOR"),
            num_processes=int(os.environ.get("DSKD_NUM_PROCESSES", "0"))
            or None,
            process_id=int(os.environ.get("DSKD_PROCESS_ID", "0")))

    cfg = load_config(args.config)
    if args.work_dir:
        cfg.train.work_dir = args.work_dir
    if args.seed is not None:
        cfg.train.seed = args.seed
    apply_overrides(cfg, args.set)

    logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                        format="%(asctime)s %(levelname)s %(message)s")
    run_incremental(cfg)


if __name__ == "__main__":
    main()

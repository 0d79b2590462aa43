#!/usr/bin/env python
"""Corruption-robustness evaluation driver.

Parity target: tools/analysis_tools/test_robustness.py in the reference —
evaluate a trained checkpoint on the validation split under every selected
corruption x severity (severity 0 = clean) and dump a nested json that
robustness_eval.py aggregates into P / mPC / rPC.

Usage:
  python tools/analysis_tools/test_robustness.py CONFIG \
      [--task N] [--corruptions gaussian_noise brightness ...] \
      [--severities 0 1 3 5] [--out robustness.json]
"""
import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("--task", type=int, default=None)
    p.add_argument("--epoch", type=int, default=None)
    p.add_argument("--work-dir", default=None)
    p.add_argument("--corruptions", nargs="*", default=None,
                   help="default: all built-in corruptions")
    p.add_argument("--severities", nargs="*", type=int,
                   default=[0, 1, 2, 3, 4, 5])
    p.add_argument("--out", default="robustness.json")
    p.add_argument("--set", nargs="*", default=[])
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                        format="%(asctime)s %(levelname)s %(message)s")
    log = logging.getLogger("dskd_tpu")

    import jax

    from dskd_tpu.data.corruptions import CORRUPTIONS
    from dskd_tpu.data.loader import DataLoader
    from dskd_tpu.data.pipeline import PipelineConfig
    from dskd_tpu.eval.evaluator import evaluate
    from dskd_tpu.train.checkpoint import (find_latest_checkpoint,
                                           restore_checkpoint)
    from dskd_tpu.train.incremental import (build_model, init_variables,
                                            make_datasets)
    from dskd_tpu.utils.config import apply_overrides, load_config

    cfg = load_config(args.config)
    if args.work_dir:
        cfg.train.work_dir = args.work_dir
    apply_overrides(cfg, args.set)

    task_nums = len(cfg.data.catsplit)
    tid = args.task or task_nums
    model = build_model(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    if args.epoch is not None:
        t, e = tid, args.epoch
    else:
        ck = find_latest_checkpoint(cfg.train.work_dir, task=tid)
        assert ck, f"no checkpoint for task {tid} in {cfg.train.work_dir}"
        t, e = ck[0], ck[1]
    restored = restore_checkpoint(
        cfg.train.work_dir, t, e,
        template={"params": variables["params"],
                  "batch_stats": variables.get("batch_stats", {}),
                  "opt_state": None, "step": 0})
    variables = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}

    _, val_ds = make_datasets(cfg, tid, task_nums)
    batch = cfg.data.samples_per_device * jax.device_count()
    corruptions = args.corruptions or list(CORRUPTIONS)

    def run_eval(corruption):
        pipe = PipelineConfig(
            img_scale=cfg.data.img_scale, flip_ratio=0.0,
            max_gt=cfg.data.max_gt, bucket=cfg.data.bucket,
            corruption=corruption)
        loader = DataLoader(val_ds, batch, pipe, train=False,
                            num_workers=cfg.data.num_workers,
                            drop_last=False,
                            num_hosts=jax.process_count(),
                            host_id=jax.process_index())
        return evaluate(model, variables, val_ds, loader,
                        reg_max=cfg.model.reg_max,
                        score_thr=cfg.test_score_thr,
                        max_per_img=cfg.test_max_per_img,
                        arch=cfg.model.arch)

    results = {c: {} for c in corruptions}
    if 0 in args.severities:
        clean = run_eval(None)       # corruption-independent, run once
        log.info("clean bbox_mAP=%.4f", clean.get("bbox_mAP", -1.0))
        for corr in corruptions:
            results[corr]["0"] = clean
    for corr in corruptions:
        for sev in args.severities:
            if sev == 0:
                continue
            stats = run_eval((corr, sev))
            results[corr][str(sev)] = stats
            log.info("%s sev=%d bbox_mAP=%.4f", corr, sev,
                     stats.get("bbox_mAP", -1.0))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    log.info("wrote %s", args.out)


if __name__ == "__main__":
    main()

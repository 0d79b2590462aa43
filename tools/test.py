#!/usr/bin/env python
"""Evaluation CLI (the reference's tools/test.py --eval bbox).

Loads a task checkpoint and runs COCO bbox evaluation over the selected
task's validation split (catload = tril row of the task).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import argparse
import logging


def main():
    parser = argparse.ArgumentParser(description="DSKD-TPU test")
    parser.add_argument("config")
    parser.add_argument("--task", type=int, default=None,
                        help="1-based task id (default: last task)")
    parser.add_argument("--epoch", type=int, default=None)
    parser.add_argument("--work-dir", default=None)
    parser.add_argument("--classwise", action="store_true")
    parser.add_argument("--tta", action="store_true",
                        help="multi-scale + flip test-time augmentation")
    parser.add_argument("--tta-scales", nargs="*", type=int, default=None,
                        help="flat H W pairs, e.g. --tta-scales 640 640 "
                             "800 800 (default: the config img_scale)")
    parser.add_argument("--out", default=None,
                        help="save detections as COCO results json "
                             "(the reference's results2json/--format-only)")
    parser.add_argument("--set", nargs="*", default=[])
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                        format="%(asctime)s %(levelname)s %(message)s")
    log = logging.getLogger("dskd_tpu")

    import jax

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
    log.info("loaded task_%d_epoch_%d", t, e)

    _, val_ds = make_datasets(cfg, tid, task_nums)
    pipe = PipelineConfig(img_scale=cfg.data.img_scale, flip_ratio=0.0,
                          max_gt=cfg.data.max_gt, bucket=cfg.data.bucket)
    batch = cfg.data.samples_per_device * jax.device_count()
    from dskd_tpu.eval.evaluator import COCO_PROTOCOL_TYPES
    coco_protocol = cfg.data.dataset_type in COCO_PROTOCOL_TYPES
    if args.tta and not coco_protocol:
        parser.error("--tta evaluates with the COCO protocol; "
                     f"dataset_type={cfg.data.dataset_type!r} scores "
                     "through its native evaluate() (drop --tta)")
    if args.tta:
        from dskd_tpu.eval.evaluator import evaluate_tta
        if args.tta_scales:
            it = iter(args.tta_scales)
            scales = list(zip(it, it))
        else:
            scales = [tuple(cfg.data.img_scale)]
        log.info("TTA eval: scales=%s + flip", scales)
        stats = evaluate_tta(model, variables, val_ds, pipe, scales,
                             flip=True, reg_max=cfg.model.reg_max,
                             score_thr=cfg.test_score_thr,
                             max_per_img=cfg.test_max_per_img,
                             classwise=args.classwise, arch=cfg.model.arch)
    elif not coco_protocol:
        # voc / wider_face / lvis / openimages score with their own
        # dataset.evaluate protocol (same dispatch as the training
        # driver's run_eval); cityscapes/hlkt/wrxt are COCO-protocol
        from dskd_tpu.eval.evaluator import evaluate_dataset_native
        loader = DataLoader(val_ds, batch, pipe, train=False,
                            num_workers=cfg.data.num_workers,
                            drop_last=False,
                            num_hosts=jax.process_count(),
                            host_id=jax.process_index())
        stats = evaluate_dataset_native(
            model, variables, val_ds, loader, cfg.model.num_classes,
            cfg.data.dataset_type, reg_max=cfg.model.reg_max,
            score_thr=cfg.test_score_thr,
            max_per_img=cfg.test_max_per_img, arch=cfg.model.arch)
    else:
        loader = DataLoader(val_ds, batch, pipe, train=False,
                            num_workers=cfg.data.num_workers,
                            drop_last=False,
                            num_hosts=jax.process_count(),
                            host_id=jax.process_index())
        results_out = [] if args.out else None
        stats = evaluate(model, variables, val_ds, loader,
                         reg_max=cfg.model.reg_max,
                         score_thr=cfg.test_score_thr,
                         max_per_img=cfg.test_max_per_img,
                         classwise=args.classwise, arch=cfg.model.arch,
                         results_out=results_out)
        if args.out:
            import json
            with open(args.out, "w") as f:
                json.dump(results_out, f)
            log.info("wrote %d detections to %s", len(results_out),
                     args.out)
    for k, v in stats.items():
        log.info("%s: %.4f", k, v)
    if "bbox_mAP" in stats:
        copypaste = " ".join(f"{stats[k]:.3f}" for k in (
            "bbox_mAP", "bbox_mAP_50", "bbox_mAP_75", "bbox_mAP_s",
            "bbox_mAP_m", "bbox_mAP_l") if k in stats)
        log.info("bbox_mAP_copypaste: %s", copypaste)


if __name__ == "__main__":
    main()

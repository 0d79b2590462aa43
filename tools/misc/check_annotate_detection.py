#!/usr/bin/env python
"""Check dataset annotations or detector outputs image-by-image (parity:
tools/misc_my/check_annotate_detection.py — the reference's COCO-style
"check annotations || check detections" debug loop, minus its hardcoded
private dataset paths).

--which annotate: draws the GT boxes of --num sampled dataset images.
--which detect:   runs the config's model (latest checkpoint in
                  work_dir unless --checkpoint) and draws detections
                  over --score-thr.
"""
import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("--which", default="annotate",
                   choices=("annotate", "detect"))
    p.add_argument("--trainval", default="val", choices=("train", "val"))
    p.add_argument("--task", type=int, default=None)
    p.add_argument("--num", type=int, default=10)
    p.add_argument("--checkpoint", default=None,
                   help="work_dir to restore from (default: the "
                   "config's train.work_dir)")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--shuffle", action="store_true")
    p.add_argument("--output-dir", default="check_out")
    args = p.parse_args()

    import cv2

    from dskd_tpu.train.incremental import make_datasets
    from dskd_tpu.utils.config import load_config
    from dskd_tpu.utils.visualization import imshow_det_bboxes

    cfg = load_config(args.config)
    task_nums = len(cfg.data.catsplit)
    tid = args.task or task_nums
    train_ds, val_ds = make_datasets(cfg, tid, task_nums)
    ds = train_ds if args.trainval == "train" else val_ds

    idxs = np.arange(len(ds))
    if args.shuffle:
        np.random.RandomState(0).shuffle(idxs)
    idxs = idxs[:args.num]
    os.makedirs(args.output_dir, exist_ok=True)

    if args.which == "detect":
        import jax

        from dskd_tpu.apis.inference import inference_detector
        from dskd_tpu.train.checkpoint import (find_latest_checkpoint,
                                               restore_checkpoint)
        from dskd_tpu.train.incremental import build_model, init_variables

        model = build_model(cfg)
        variables = init_variables(model, cfg, jax.random.PRNGKey(0))
        work_dir = args.checkpoint or cfg.train.work_dir
        ck = find_latest_checkpoint(work_dir, task=tid)
        assert ck, f"no checkpoint in {work_dir}"
        restored = restore_checkpoint(
            work_dir, ck[0], ck[1],
            template={"params": variables["params"],
                      "batch_stats": variables.get("batch_stats", {}),
                      "opt_state": None, "step": 0})
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}

    for i in idxs:
        path, _, boxes, labels, img_id = ds.get_raw(int(i))
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        if args.which == "annotate":
            vis = imshow_det_bboxes(img, boxes, labels,
                                    class_names=ds.CLASSES)
        else:
            det = inference_detector(model, variables, cfg, path)
            b, l, s = [], [], []
            for c, d in enumerate(det):
                keep = d[:, 4] >= args.score_thr
                b.append(d[keep, :4])
                l.extend([c] * int(keep.sum()))
                s.extend(d[keep, 4].tolist())
            b = np.concatenate(b) if b else np.zeros((0, 4))
            vis = imshow_det_bboxes(
                img, np.concatenate([b, np.array(s).reshape(-1, 1)], -1)
                if len(b) else b,
                np.array(l, int), class_names=ds.CLASSES)
        out = os.path.join(args.output_dir,
                           f"{args.which}_{img_id}.jpg")
        cv2.imwrite(out, cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
    print(f"wrote {len(idxs)} images to {args.output_dir}")


if __name__ == "__main__":
    main()

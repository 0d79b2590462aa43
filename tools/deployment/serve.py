#!/usr/bin/env python
"""Minimal detection HTTP server (the reference's mmdet2torchserve +
mmdet_handler analog, TPU-native).

POST an image (raw bytes) to /predictions -> JSON list of
{"class_name", "bbox": [x1, y1, x2, y2], "score"} above --score-thr,
exactly the handler's postprocess payload (deployment/mmdet_handler.py:
37-61). GET /ping -> health.

The model is jitted once at startup (compile happens on the first request
shape — a fixed --size keeps it to one program).

Usage:
  python tools/deployment/serve.py CONFIG [--task N] [--port 8080] ...
  curl -s -X POST --data-binary @img.jpg localhost:8080/predictions
"""
import argparse
import json
import logging
import os
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def build_handler(cfg_path, task=None, epoch=None, work_dir=None,
                  score_thr=0.3, random_init=False):
    """Returns handle(image_bytes) -> list of detection dicts."""
    import numpy as np
    import jax

    from dskd_tpu.apis.inference import inference_detector
    from dskd_tpu.train.checkpoint import (find_latest_checkpoint,
                                           restore_checkpoint)
    from dskd_tpu.train.incremental import (build_model, init_variables,
                                            make_datasets)
    from dskd_tpu.utils.config import load_config

    cfg = load_config(cfg_path) if isinstance(cfg_path, str) else cfg_path
    if work_dir:
        cfg.train.work_dir = work_dir
    model = build_model(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    task_nums = len(cfg.data.catsplit)
    tid = task or task_nums
    if not random_init:
        if epoch is not None:
            t, e = tid, epoch
        else:
            ck = find_latest_checkpoint(cfg.train.work_dir, task=tid)
            assert ck, f"no checkpoint in {cfg.train.work_dir}"
            t, e = ck[0], ck[1]
        restored = restore_checkpoint(
            cfg.train.work_dir, t, e,
            template={"params": variables["params"],
                      "batch_stats": variables.get("batch_stats", {}),
                      "opt_state": None, "step": 0})
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}
    try:
        _, val_ds = make_datasets(cfg, tid, task_nums)
        class_names = [n for n, _ in val_ds.PRED_CLASSES]
    except Exception:        # serving without the dataset on disk
        class_names = None

    def handle(image_bytes: bytes):
        import cv2
        arr = cv2.imdecode(np.frombuffer(image_bytes, np.uint8),
                           cv2.IMREAD_COLOR)
        assert arr is not None, "undecodable image payload"
        img = cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)
        result = inference_detector(model, variables, cfg, img)
        out = []
        for c, dets in enumerate(result):
            for x1, y1, x2, y2, s in np.asarray(dets).reshape(-1, 5):
                if s < score_thr:
                    continue
                name = class_names[c] if class_names else str(c)
                out.append({"class_name": name,
                            "bbox": [float(x1), float(y1),
                                     float(x2), float(y2)],
                            "score": float(s)})
        return out

    return handle


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("--task", type=int, default=None)
    p.add_argument("--epoch", type=int, default=None)
    p.add_argument("--work-dir", default=None)
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--score-thr", type=float, default=0.3)
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("dskd_tpu.serve")
    handle = build_handler(args.config, args.task, args.epoch,
                           args.work_dir, args.score_thr)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/ping":
                body = b'{"status": "Healthy"}'
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(n)
            try:
                result = handle(data)
                body = json.dumps(result).encode()
                code = 200
            except Exception as e:  # noqa: BLE001
                body = json.dumps({"error": str(e)}).encode()
                code = 500
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *a):
            log.info(fmt, *a)

    log.info("serving on :%d", args.port)
    HTTPServer(("", args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()

"""Metrics logging (parity: mmcv TextLoggerHook + TensorboardLoggerHook).

Writes human-readable lines through the standard logger AND structured
JSONL records (one object per log event) to <work_dir>/<timestamp>.log.json
— the same artifact the reference's analyze_logs.py consumes.
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, work_dir: Optional[str] = None,
                 name: str = "dskd_tpu"):
        self.log = logging.getLogger(name)
        self.jsonl = None
        if work_dir:
            os.makedirs(work_dir, exist_ok=True)
            stamp = time.strftime("%Y%m%d_%H%M%S")
            self.jsonl = open(os.path.join(work_dir, f"{stamp}.log.json"),
                              "a", buffering=1)

    def log_metrics(self, mode: str, epoch: int, it: int, metrics: Dict,
                    task: Optional[int] = None, lr: Optional[float] = None):
        rec = dict(mode=mode, epoch=epoch, iter=it)
        if task is not None:
            rec["task"] = task
        if lr is not None:
            rec["lr"] = round(float(lr), 8)
        rec.update({k: round(float(v), 5) for k, v in metrics.items()})
        if self.jsonl:
            self.jsonl.write(json.dumps(rec) + "\n")
        msg = " ".join(f"{k}={v}" for k, v in rec.items())
        self.log.info(msg)

    def close(self):
        if self.jsonl:
            self.jsonl.close()


def collect_env() -> dict:
    """Environment fingerprint logged at run start (parity:
    mmdet.utils.collect_env via train_increment.py:168-173)."""
    import platform

    import jax

    try:
        import flax
        flax_v = flax.__version__
    except Exception:                                    # pragma: no cover
        flax_v = "?"
    devs = jax.devices()
    return dict(
        python=platform.python_version(),
        jax=jax.__version__, flax=flax_v,
        backend=jax.default_backend(),
        device_kind=devs[0].device_kind if devs else "none",
        device_count=len(devs),
        process_count=jax.process_count(),
        platform=platform.platform())


def dump_config(cfg, work_dir: str) -> None:
    """Dump the resolved experiment config to work_dir (parity:
    cfg.dump, train_increment.py:158)."""
    import dataclasses
    import json
    import os

    if not work_dir:
        return
    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)

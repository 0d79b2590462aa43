"""Task-aware checkpointing via Orbax (parity: mmcv CheckpointHook +
TaskEpochBasedRunner's task_{t}_epoch_{e}.pth naming, SURVEY §5).

"Checkpoint surgery" (the BASELINE's model_update step) is pytree merge:
the student promotes to teacher by copying the params pytree; resuming a
task loads {params, opt_state, step} for that task's optimizer.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _ckpt_dir(work_dir: str, task: int, epoch: int) -> str:
    return os.path.join(os.path.abspath(work_dir),
                        f"task_{task}_epoch_{epoch}")


def save_checkpoint(work_dir: str, task: int, epoch: int, state,
                    teacher_params=None, save_teacher: bool = False):
    payload = {"params": state.params, "batch_stats": state.batch_stats,
               "opt_state": state.opt_state,
               "step": state.step}
    if save_teacher and teacher_params is not None:
        payload["teacher_params"] = teacher_params
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(_ckpt_dir(work_dir, task, epoch), payload, force=True)


def restore_checkpoint(work_dir: str, task: int, epoch: int,
                       template: Any = None):
    """Restore a task checkpoint. Template entries that are None (e.g.
    eval-time loads passing opt_state=None) are filled from a raw restore
    instead of strict template matching — the reference's load_checkpoint
    (weights-only) vs runner.resume (full state) distinction."""
    ckptr = ocp.PyTreeCheckpointer()
    path = _ckpt_dir(work_dir, task, epoch)
    if template is None:
        return ckptr.restore(path)
    if all(v is not None for v in template.values()):
        try:
            return ckptr.restore(path, item=template)
        except ValueError:
            pass   # structure mismatch (e.g. save_teacher extras on disk)
    # reconcile: fill None template entries and on-disk extras from a raw
    # restore, then re-restore against the full structure
    raw = ckptr.restore(path)
    item = {k: (raw.get(k) if v is None else v)
            for k, v in template.items()}
    for k in raw:
        item.setdefault(k, raw[k])
    restored = ckptr.restore(path, item=item)
    return restored


def find_latest_checkpoint(work_dir: str, task: Optional[int] = None):
    """Scan work_dir for task_{t}_epoch_{e} dirs (reference
    utils/misc.py find_latest_checkpoint behavior, task-aware)."""
    if not os.path.isdir(work_dir):
        return None
    best = None
    pat = re.compile(r"task_(\d+)_epoch_(\d+)$")
    for name in os.listdir(work_dir):
        m = pat.match(name)
        if not m:
            continue
        t, e = int(m.group(1)), int(m.group(2))
        if task is not None and t != task:
            continue
        if best is None or (t, e) > best[:2]:
            best = (t, e, os.path.join(work_dir, name))
    return best

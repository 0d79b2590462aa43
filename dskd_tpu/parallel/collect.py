"""Multi-host result gathering (the collect_results_cpu/gpu contract).

Parity target: mmdet/apis/test.py:136-209 — after a sharded eval pass,
every host holds detections for its slice of the dataset; the reference
pickles per-rank shards to a broadcast tmpdir (CPU path) or all_gathers
padded byte tensors (GPU path). TPU-native: pad each host's fixed-shape
detection arrays to the global max image count and process_allgather them
over ICI/DCN — no filesystem rendezvous, no pickling.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import numpy as np


def collect_image_results(local: List[Tuple[int, np.ndarray, np.ndarray,
                                            List[int]]],
                          max_dets: int) -> List[Tuple[int, np.ndarray,
                                                       np.ndarray,
                                                       List[int]]]:
    """Gather per-image detection tuples from every host.

    local: list of (img_id, boxes (k, 4), scores (k,), cat_ids (k,)) with
    k <= max_dets, optionally extended with a 5th element of per-det
    uint8 mask grids (k, S, S) (Mask R-CNN's quantized 28x28 probs) and a
    6th of per-det mask scores (MS R-CNN's IoU-rescored segm ranking),
    both riding the same fixed-shape allgather. Returns the concatenated list
    over all hosts (every host gets the full set, deterministically
    ordered by (host, local index)). Single-process: returns ``local``
    unchanged.
    """
    if jax.process_count() == 1:
        return local

    from jax.experimental import multihost_utils

    n_local = len(local)
    has_masks = any(len(r) > 4 for r in local)
    # first agree on the max shard size (and the mask grid size, if any)
    s_local = max((r[4].shape[-1] for r in local if len(r) > 4),
                  default=0)
    counts = multihost_utils.process_allgather(
        np.array([n_local, s_local], np.int32))     # (n_hosts, 2)
    n_max = int(counts[:, 0].max())
    s_max = int(counts[:, 1].max())
    has_masks = has_masks or s_max > 0

    ids = np.full((n_max,), -1, np.int64)
    boxes = np.zeros((n_max, max_dets, 4), np.float32)
    scores = np.zeros((n_max, max_dets), np.float32)
    cats = np.zeros((n_max, max_dets), np.int32)
    ndet = np.zeros((n_max,), np.int32)
    masks = (np.zeros((n_max, max_dets, s_max, s_max), np.uint8)
             if has_masks else None)
    has_mscores = any(len(r) > 5 for r in local)
    has_mscores = bool(multihost_utils.process_allgather(
        np.array([has_mscores], np.int32)).max())
    mscores = (np.zeros((n_max, max_dets), np.float32)
               if has_mscores else None)
    for i, rec in enumerate(local):
        img_id, b, s, c = rec[:4]
        k = min(len(s), max_dets)
        ids[i] = img_id
        boxes[i, :k] = b[:k]
        scores[i, :k] = s[:k]
        cats[i, :k] = np.asarray(c[:k], np.int32)
        ndet[i] = k
        if has_masks and len(rec) > 4:
            masks[i, :k] = rec[4][:k]
        if has_mscores and len(rec) > 5:
            mscores[i, :k] = rec[5][:k]

    payload = dict(ids=ids, boxes=boxes, scores=scores, cats=cats,
                   ndet=ndet)
    if has_masks:
        payload["masks"] = masks
    if has_mscores:
        payload["mscores"] = mscores
    g = multihost_utils.process_allgather(payload)

    out = []
    n_hosts = g["ids"].shape[0]
    for h in range(n_hosts):
        for i in range(n_max):
            if g["ids"][h, i] < 0:
                continue
            k = int(g["ndet"][h, i])
            rec = (int(g["ids"][h, i]), g["boxes"][h, i, :k],
                   g["scores"][h, i, :k], g["cats"][h, i, :k].tolist())
            if has_masks:
                rec = rec + (g["masks"][h, i, :k],)
            if has_mscores:
                rec = rec + (g["mscores"][h, i, :k],)
            out.append(rec)
    return out

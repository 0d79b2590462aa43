"""Panoptic Quality (PQ) evaluation, from scratch in numpy.

Parity: mmdet/datasets/api_wrappers/panoptic_evaluation.py (the vendored
panopticapi pq_compute_single_core contract) + coco_panoptic.py
evaluate(): per-image confusion map between GT and predicted panoptic id
maps, category-consistent matching at IoU > 0.5 (VOID-corrected unions),
crowd-aware FP/FN counting, and PQ = sum(IoU_tp) / (TP + FP/2 + FN/2)
with SQ/RQ factorization and things/stuff splits.

Panoptic maps use the repo convention pan_id = ins_id * INSTANCE_OFFSET
+ contiguous_category (models/panoptic_fpn.py); ``void_label`` marks
unlabeled pixels.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..models.panoptic_fpn import INSTANCE_OFFSET

_OFFSET = np.uint64(2 ** 32)


class PQStatCat:
    __slots__ = ("iou", "tp", "fp", "fn")

    def __init__(self):
        self.iou = 0.0
        self.tp = 0
        self.fp = 0
        self.fn = 0


class PQStat:
    """Per-category accumulation (panopticapi PQStat)."""

    def __init__(self):
        self.per_cat: Dict[int, PQStatCat] = {}

    def cat(self, c: int) -> PQStatCat:
        if c not in self.per_cat:
            self.per_cat[c] = PQStatCat()
        return self.per_cat[c]

    def add_image(self, pan_gt: np.ndarray, pan_pred: np.ndarray,
                  void_label: int,
                  gt_crowd: Optional[Dict[int, int]] = None):
        """Accumulate one image.

        pan_gt/pan_pred: (H, W) int64 panoptic id maps. void_label is the
        category marking unlabeled pixels (pixels whose
        ``pan % INSTANCE_OFFSET == void_label`` are VOID). gt_crowd maps a
        GT segment id -> 1 when that segment is crowd (ignored for
        matching but absorbing for FP suppression)."""
        gt_crowd = gt_crowd or {}

        def segments(pan):
            ids, cnt = np.unique(pan, return_counts=True)
            return {int(i): int(c) for i, c in zip(ids, cnt)
                    if int(i) % INSTANCE_OFFSET != void_label}

        gt_segms = segments(pan_gt)
        pred_segms = segments(pan_pred)
        gt_void = ~np.isin(pan_gt, list(gt_segms.keys()))

        # confusion map
        comb = pan_gt.astype(np.uint64) * _OFFSET + pan_pred.astype(
            np.uint64)
        labels, cnts = np.unique(comb, return_counts=True)
        inter: Dict[Tuple[int, int], int] = {}
        for lab, c in zip(labels, cnts):
            inter[(int(lab // _OFFSET), int(lab % _OFFSET))] = int(c)

        # VOID intersection per predicted segment
        comb_v = np.where(gt_void, pan_pred, -1)
        v_ids, v_cnt = np.unique(comb_v, return_counts=True)
        void_inter = {int(i): int(c) for i, c in zip(v_ids, v_cnt)
                      if i >= 0}

        gt_matched, pred_matched = set(), set()
        for (g, p), i in inter.items():
            if g not in gt_segms or p not in pred_segms:
                continue
            if gt_crowd.get(g, 0):
                continue
            g_cat = g % INSTANCE_OFFSET
            if g_cat != p % INSTANCE_OFFSET:
                continue
            union = (gt_segms[g] + pred_segms[p] - i
                     - void_inter.get(p, 0))
            iou = i / max(union, 1)
            if iou > 0.5:
                s = self.cat(g_cat)
                s.tp += 1
                s.iou += iou
                gt_matched.add(g)
                pred_matched.add(p)

        crowd_by_cat: Dict[int, int] = {}
        for g in gt_segms:
            if g in gt_matched:
                continue
            if gt_crowd.get(g, 0):
                crowd_by_cat[g % INSTANCE_OFFSET] = g
                continue
            self.cat(g % INSTANCE_OFFSET).fn += 1

        for p, area in pred_segms.items():
            if p in pred_matched:
                continue
            cat = p % INSTANCE_OFFSET
            i = void_inter.get(p, 0)
            if cat in crowd_by_cat:
                i += inter.get((crowd_by_cat[cat], p), 0)
            # mostly-VOID/crowd predictions are ignored, not FPs
            if i / max(area, 1) > 0.5:
                continue
            self.cat(cat).fp += 1

    def summarize(self, thing_cats: Sequence[int],
                  stuff_cats: Sequence[int]) -> Dict[str, float]:
        """PQ/SQ/RQ overall + per-split (coco_panoptic.py evaluate
        keys)."""
        def agg(cats):
            pq = sq = rq = 0.0
            n = 0
            for c in cats:
                s = self.per_cat.get(c)
                if s is None or (s.tp + s.fp + s.fn) == 0:
                    continue
                n += 1
                denom = s.tp + 0.5 * s.fp + 0.5 * s.fn
                pq += s.iou / denom
                sq += (s.iou / s.tp) if s.tp else 0.0
                rq += s.tp / denom
            if n == 0:
                return dict(pq=-1.0, sq=-1.0, rq=-1.0, n=0)
            return dict(pq=pq / n, sq=sq / n, rq=rq / n, n=n)

        allc = list(thing_cats) + list(stuff_cats)
        out = {}
        for name, cats in (("", allc), ("_th", thing_cats),
                           ("_st", stuff_cats)):
            a = agg(cats)
            out[f"PQ{name}"] = 100 * a["pq"] if a["n"] else -1.0
            out[f"SQ{name}"] = 100 * a["sq"] if a["n"] else -1.0
            out[f"RQ{name}"] = 100 * a["rq"] if a["n"] else -1.0
        return out


def evaluate_panoptic(model, variables, dataset, loader,
                      score_thr: float = 0.05, max_per_img: int = 100,
                      mask_thr: float = 0.5, overlap_thr: float = 0.5,
                      stuff_area_limit: int = 4096) -> Dict[str, float]:
    """Full panoptic evaluation (tools/test.py metric='PQ' analog):
    jitted box+mask+semantic inference per batch, host-side mask paste +
    heuristic fusion, PQ against the dataset's panoptic PNG GT.

    dataset: data/coco_panoptic.py CocoPanopticDataset; loader: the
    standard DataLoader over it (test mode)."""
    import jax.numpy as jnp

    from ..data.masks import paste_masks_np
    from ..models.panoptic_fpn import heuristic_fuse
    from .evaluator import make_eval_step

    step = make_eval_step(model, score_thr=score_thr,
                          max_per_img=max_per_img, arch="panoptic_fpn")
    stat = PQStat()
    seen = set()
    nt, ns = dataset.num_things, dataset.num_stuff
    for batch, meta in loader:
        det = step(variables, batch.images, batch.img_hw,
                   jnp.asarray(meta["scale_factors"]))
        boxes = np.asarray(det.bboxes)
        scores = np.asarray(det.scores)
        labels = np.asarray(det.labels)
        valid = np.asarray(det.valid)
        masks = np.asarray(det.masks)
        seg = np.asarray(det.seg)                # (B, H/4, W/4, ns + 1)
        for i, img_id in enumerate(meta["img_ids"]):
            if img_id in seen:
                continue
            seen.add(img_id)
            info = dataset.images[img_id]
            h0, w0 = info["height"], info["width"]
            keep = valid[i] & (scores[i] > score_thr)
            inst = paste_masks_np(masks[i][keep].astype(np.float32),
                                  boxes[i][keep], (h0, w0), thr=mask_thr)
            # semantic logits: crop the valid canvas, resize to original
            hv, wv = (int(meta["ori_hw"][i][0] * meta["scale_factors"]
                          [i][1]) // 4,
                      int(meta["ori_hw"][i][1] * meta["scale_factors"]
                          [i][0]) // 4)
            s = seg[i][:max(hv, 1), :max(wv, 1)]
            try:
                import cv2
                s_up = cv2.resize(s, (w0, h0),
                                  interpolation=cv2.INTER_LINEAR)
            except Exception:                     # pragma: no cover
                ry = (np.arange(h0) * s.shape[0] // h0).clip(
                    0, s.shape[0] - 1)
                rx = (np.arange(w0) * s.shape[1] // w0).clip(
                    0, s.shape[1] - 1)
                s_up = s[ry][:, rx]
            pan = heuristic_fuse(boxes[i][keep], scores[i][keep],
                                 labels[i][keep], inst, s_up, nt, ns,
                                 overlap_thr=overlap_thr,
                                 stuff_area_limit=stuff_area_limit)
            gt_pan, gt_crowd = dataset.get_pan_gt(img_id)
            stat.add_image(gt_pan, pan, void_label=nt + ns,
                           gt_crowd=gt_crowd)
    thing_lbls = [dataset.cat2label[c] for c in dataset.thing_cat_ids]
    stuff_lbls = [dataset.cat2label[c] for c in dataset.stuff_cat_ids]
    return stat.summarize(thing_lbls, stuff_lbls)

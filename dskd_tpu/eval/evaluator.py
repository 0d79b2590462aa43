"""Model evaluation loop: jitted inference -> COCO bbox metrics.

Parity target: tools/test.py + apis/test.py single_gpu_test ->
dataset.evaluate(metric='bbox') (SURVEY §3.4). Inference runs as one jitted
batch function on device; box collection and COCOeval run on host (async
with respect to the next batch's device step).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.coco import TaskCocoDataset
from ..data.loader import DataLoader
from .coco_eval import CocoDetectionEval

# dataset_type values that score with the COCO protocol (evaluate());
# every other binding routes through its own dataset.evaluate
# (evaluate_dataset_native)
COCO_PROTOCOL_TYPES = ("coco", "cityscapes", "hlkt", "wrxt")


def make_eval_step(model, reg_max: int = 16, score_thr: float = 0.0,
                   max_per_img: int = 100, arch: str = "gfl_deformable_detr"):
    """Family-dispatching jitted inference step: a thin lookup over the
    family registry (dskd_tpu/registry.py). Every family's eval_step
    factory lives in its own model module; each returns a
    DetResults-compatible structure (bboxes/scores/labels/valid, plus
    masks / mask_scores / seg for the mask and panoptic families)."""
    from ..registry import get_family
    spec = get_family(arch)
    if spec is None or spec.get("eval_step") is None:
        raise ValueError(f"no eval step for arch: {arch}")
    return spec["eval_step"](model, score_thr=score_thr,
                             max_per_img=max_per_img, reg_max=reg_max)


def _box_poly(bbox_xywh):
    """Box-fill polygon for GT annotations that lack a segmentation."""
    x, y, w, h = bbox_xywh
    return [[x, y, x + w, y, x + w, y + h, x, y + h]]


def evaluate(model, variables, dataset: TaskCocoDataset, loader: DataLoader,
             reg_max: int = 16, score_thr: float = 0.0,
             max_per_img: int = 100, classwise: bool = False,
             arch: str = "gfl_deformable_detr",
             results_out: Optional[list] = None) -> Dict[str, float]:
    """Run inference over the loader and compute COCO bbox stats.

    Evaluation classes follow the dataset's PRED_CLASSES (the x-class IL
    protocol: prev+cur classes are scored, like catpred='prev-cur')."""
    # RPN families are class-agnostic: the reference scores them with
    # the proposal protocol (CocoDataset.evaluate metric='proposal':
    # every det and every GT collapse to one category; AR@k is the
    # headline). Per-category matching would score proposals against
    # only one class's GT and report noise.
    agnostic = arch in ("rpn", "ga_rpn", "cascade_rpn")
    if agnostic:
        pred_cat_ids = [-1]
        pred_label_set = None
        ev = CocoDetectionEval(cat_ids=pred_cat_ids)
    else:
        pred_cat_ids = [dataset.ALL_CLASSES_IDS[n]
                        for n in dataset.PRED_CLASSES]
        pred_label_set = {dataset.cat2label[c] for c in pred_cat_ids}
        ev = CocoDetectionEval(cat_ids=pred_cat_ids)

    eval_step = make_eval_step(model, reg_max, score_thr, max_per_img,
                               arch=arch)
    local_results = []
    local_seen = set()
    with_masks = False
    for batch, meta in loader:
        det = eval_step(variables, batch.images, batch.img_hw,
                        jnp.asarray(meta["scale_factors"]))
        boxes = np.asarray(det.bboxes)
        scores = np.asarray(det.scores)
        labels = np.asarray(det.labels)
        valid = np.asarray(det.valid)
        det_masks = getattr(det, "masks", None)
        if det_masks is not None:
            # quantize the 28x28 probs for the cross-host gather
            det_masks = (np.asarray(det_masks) * 255).astype(np.uint8)
            with_masks = True
        det_mscores = getattr(det, "mask_scores", None)
        if det_mscores is not None:
            det_mscores = np.asarray(det_mscores)
        for i, img_id in enumerate(meta["img_ids"]):
            if img_id in local_seen:     # last-batch padding duplicates
                continue
            local_seen.add(img_id)
            if agnostic:
                keep = valid[i]
                cats_i = [-1] * int(keep.sum())
            else:
                keep = valid[i] & np.isin(labels[i],
                                          np.array(sorted(pred_label_set)))
                cats_i = [dataset.label2cat[int(l)]
                          for l in labels[i][keep]]
            rec = (img_id, boxes[i][keep], scores[i][keep], cats_i)
            if det_masks is not None:
                rec = rec + (det_masks[i][keep],)
            if det_mscores is not None:
                rec = rec + (det_mscores[i][keep],)
            local_results.append(rec)

    # multi-host: gather every host's shard (collect_results_cpu contract,
    # apis/test.py:136-176); every host then scores the full set
    from ..parallel.collect import collect_image_results
    all_results = collect_image_results(local_results, max_dets=max_per_img)
    ev_segm = (CocoDetectionEval(cat_ids=pred_cat_ids, iou_type="segm")
               if with_masks else None)
    seen = set()
    for rec in all_results:
        img_id, b, s, cats = rec[:4]
        if img_id in seen:       # cross-host duplicates (uneven shards)
            continue
        seen.add(img_id)
        ev.add_dt(img_id, b, s, list(cats))
        if ev_segm is not None:
            from ..data.masks import paste_masks_np
            info = dataset.coco.images[img_id]
            pasted = paste_masks_np(
                np.asarray(rec[4], np.float32) / 255.0, np.asarray(b),
                (info["height"], info["width"]))
            # MS R-CNN ranks segm dets by cls_score * predicted mask IoU
            s_m = rec[5] if len(rec) > 5 else s
            ev_segm.add_dt(img_id, b, s_m, list(cats), masks=pasted)
        if results_out is not None:
            # results2json format: xywh + score + category_id per det
            for bb, sc, cat in zip(np.asarray(b), np.asarray(s), cats):
                results_out.append(dict(
                    image_id=int(img_id),
                    bbox=[float(bb[0]), float(bb[1]),
                          float(bb[2] - bb[0]), float(bb[3] - bb[1])],
                    score=float(sc), category_id=int(cat)))

    # ground truth for the evaluated images
    for img_id in seen:
        anns = dataset.coco.annotations(img_id)
        if not agnostic:
            anns = [a for a in anns
                    if a["category_id"] in set(pred_cat_ids)]
        if not anns:
            continue
        gt = np.array([[a["bbox"][0], a["bbox"][1],
                        a["bbox"][0] + a["bbox"][2],
                        a["bbox"][1] + a["bbox"][3]] for a in anns])
        cats_g = ([-1] * len(anns) if agnostic
                  else [a["category_id"] for a in anns])
        crowd_g = [a.get("iscrowd", 0) for a in anns]
        areas_g = [a.get("area", None) or a["bbox"][2] * a["bbox"][3]
                   for a in anns]
        ev.add_gt(img_id, gt, cats_g, iscrowd=crowd_g, areas=areas_g)
        if ev_segm is not None:
            from ..data.masks import ann_to_bitmap
            info = dataset.coco.images[img_id]
            h0, w0 = info["height"], info["width"]
            gm = np.stack([
                ann_to_bitmap(a.get("segmentation")
                              or _box_poly(a["bbox"]), h0, w0)
                for a in anns])
            ev_segm.add_gt(img_id, gt, cats_g, iscrowd=crowd_g,
                           areas=areas_g, masks=gm)

    stats = ev.summarize()
    if ev_segm is not None:
        stats.update({k: v for k, v in ev_segm.summarize().items()
                      if k.startswith("segm")})
    if classwise:
        per_class = ev.per_class_ap()
        for cid, ap in per_class.items():
            stats[f"AP_{dataset.ALL_IDS_CLASSES[cid]}"] = ap
    return stats


def evaluate_tta(model, variables, dataset: TaskCocoDataset,
                 base_pipe, scales, flip: bool = True,
                 reg_max: int = 16, score_thr: float = 0.0,
                 max_per_img: int = 100, classwise: bool = False,
                 arch: str = "gfl_deformable_detr") -> Dict[str, float]:
    """Multi-scale + flip test-time augmentation evaluation.

    Parity: MultiScaleFlipAug pipeline + merge_augs (tools/test.py with a
    TTA test pipeline). Each image runs through every (scale, flip)
    variant on device; detections map back to original coordinates and
    fuse with one class-aware NMS (eval/tta.py).
    """
    from ..data.pipeline import load_image
    from .tta import map_back, merge_aug_detections, tta_variants

    pred_cat_ids = [dataset.ALL_CLASSES_IDS[n] for n in dataset.PRED_CLASSES]
    pred_label_set = np.array(
        sorted(dataset.cat2label[c] for c in pred_cat_ids))
    ev = CocoDetectionEval(cat_ids=pred_cat_ids)
    eval_step = make_eval_step(model, reg_max, score_thr, max_per_img,
                               arch=arch)
    ones = jnp.ones((1, 4), jnp.float32)

    for i in range(len(dataset)):
        path, _, _, _, img_id = dataset.get_raw(i)
        img = load_image(path)
        per_variant = []
        for s in tta_variants(img, scales, flip, base_pipe):
            det = eval_step(variables, jnp.asarray(s["image"][None]),
                            jnp.asarray(s["img_hw"][None]), ones)
            keep = np.asarray(det.valid[0])
            boxes = map_back(np.asarray(det.bboxes[0])[keep],
                             s["scale_factor"], s["flip"], s["img_hw"])
            per_variant.append((boxes, np.asarray(det.scores[0])[keep],
                                np.asarray(det.labels[0])[keep],
                                np.ones(int(keep.sum()), bool)))
        boxes, scores, labels, valid = merge_aug_detections(
            per_variant, max_per_img=max_per_img)
        sel = valid & np.isin(labels, pred_label_set)
        ev.add_dt(img_id, boxes[sel], scores[sel],
                  [dataset.label2cat[int(l)] for l in labels[sel]])

    for i in range(len(dataset)):
        img_id = dataset.get_raw(i)[4]
        anns = [a for a in dataset.coco.annotations(img_id)
                if a["category_id"] in set(pred_cat_ids)]
        if not anns:
            continue
        gt = np.array([[a["bbox"][0], a["bbox"][1],
                        a["bbox"][0] + a["bbox"][2],
                        a["bbox"][1] + a["bbox"][3]] for a in anns])
        ev.add_gt(img_id, gt, [a["category_id"] for a in anns],
                  iscrowd=[a.get("iscrowd", 0) for a in anns],
                  areas=[a.get("area", None) or a["bbox"][2] * a["bbox"][3]
                         for a in anns])

    stats = ev.summarize()
    if classwise:
        for cid, ap in ev.per_class_ap().items():
            stats[f"AP_{dataset.ALL_IDS_CLASSES[cid]}"] = ap
    return stats


def evaluate_dataset_native(model, variables, dataset, loader: DataLoader,
                            num_classes: int, dataset_type: str,
                            reg_max: int = 16, score_thr: float = 0.0,
                            max_per_img: int = 100,
                            arch: str = "gfl_deformable_detr"
                            ) -> Dict[str, float]:
    """Inference + the dataset's OWN evaluate() protocol.

    The mmdet runtime dispatches `dataset.evaluate(results)` per dataset
    class (voc.py / wider_face.py / openimages.py / lvis.py each override
    it); this is the same dispatch for the non-COCO bindings of
    DataConfig.dataset_type. List-protocol datasets (voc, wider_face,
    openimages) receive results[i][c] = (m, 5) xyxy+score arrays in
    dataset index order; LVIS receives {img_id: dict(bboxes, scores,
    labels)}.
    """
    eval_step = make_eval_step(model, reg_max, score_thr, max_per_img,
                               arch=arch)
    local, seen = [], set()
    for batch, meta in loader:
        det = eval_step(variables, batch.images, batch.img_hw,
                        jnp.asarray(meta["scale_factors"]))
        boxes = np.asarray(det.bboxes)
        scores = np.asarray(det.scores)
        labels = np.asarray(det.labels)
        valid = np.asarray(det.valid)
        for i, img_id in enumerate(meta["img_ids"]):
            if img_id in seen:
                continue
            seen.add(img_id)
            keep = valid[i]
            local.append((img_id, boxes[i][keep], scores[i][keep],
                          [int(l) for l in labels[i][keep]]))
    if jax.process_count() > 1:
        from ..parallel.collect import collect_image_results
        local = collect_image_results(local, max_dets=max_per_img)
    per_img = {}
    for img_id, b, s, ls in local:
        if img_id not in per_img:
            per_img[img_id] = (b, s, np.asarray(ls, np.int64))

    if dataset_type == "lvis":
        results = {img_id: dict(bboxes=b, scores=s, labels=ls)
                   for img_id, (b, s, ls) in per_img.items()}
        return dataset.evaluate(results)

    results = []
    for i in range(len(dataset)):
        img_id = dataset.get_raw(i)[4]
        b, s, ls = per_img.get(
            img_id, (np.zeros((0, 4), np.float32),
                     np.zeros((0,), np.float32),
                     np.zeros((0,), np.int64)))
        dets = np.concatenate([b, s[:, None]], axis=1).astype(np.float32)
        results.append([dets[ls == c] for c in range(num_classes)])
    return dataset.evaluate(results)

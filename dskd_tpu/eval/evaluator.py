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
from ..models.gfl_detr_head import get_bboxes
from .coco_eval import CocoDetectionEval

# dataset_type values that score with the COCO protocol (evaluate());
# every other binding routes through its own dataset.evaluate
# (evaluate_dataset_native)
COCO_PROTOCOL_TYPES = ("coco", "cityscapes", "hlkt", "wrxt")


def make_eval_step(model, reg_max: int = 16, score_thr: float = 0.0,
                   max_per_img: int = 100, arch: str = "gfl_deformable_detr"):
    """Family-dispatching jitted inference step. Every family returns a
    DetResults-compatible structure (bboxes/scores/labels/valid)."""
    from ..registry import get_family
    spec = get_family(arch)
    if spec is not None and spec.get("eval_step") is not None:
        return spec["eval_step"](model, score_thr=score_thr,
                                 max_per_img=max_per_img)

    if arch in ("gfl_deformable_detr", "deformable_detr_il"):
        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            return get_bboxes(out.head.cls_scores[-1],
                              out.head.bbox_preds[-1], img_hw,
                              scale_factor=scale_factors, reg_max=reg_max,
                              score_thr=score_thr, max_per_img=max_per_img,
                              rescale=True)
        return eval_step

    from collections import namedtuple
    Det = namedtuple("Det", ["bboxes", "scores", "labels", "valid"])

    if arch == "yolof":
        from ..models.yolof_head import yolof_anchors, yolof_get_bboxes

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            d = yolof_get_bboxes(out.head, yolof_anchors(out.head.feat_hw),
                                 img_hw, scale_factor=scale_factors,
                                 score_thr=max(score_thr, 0.05),
                                 max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch in ("yoloy", "yolox"):
        from ..models.yoloy_head import yoloy_get_bboxes

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            d = yoloy_get_bboxes(out.head, img_hw,
                                 scale_factor=scale_factors,
                                 score_thr=max(score_thr, 0.01),
                                 max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch in ("gfl", "ld"):
        from ..models.gfl_head import gfl_get_bboxes

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            d = gfl_get_bboxes(out.head, img_hw, scale_factor=scale_factors,
                               reg_max=reg_max,
                               score_thr=max(score_thr, 0.05),
                               max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch in ("retinanet", "free_anchor", "pisa_retinanet",
                "retinanet_ghm", "retinanet_fpg", "retinanet_nasfpn"):
        from ..models.retinanet import retina_anchors, retina_get_bboxes

        # free_anchor's config swaps the retina coder stds for
        # (0.1, 0.1, 0.2, 0.2) (free_anchor config bbox_coder)
        from ..models.free_anchor import DELTA_STDS as _FA_STDS
        _stds = _FA_STDS if arch == "free_anchor" else (1.0,) * 4

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            anchors = retina_anchors(
                [c.shape[1:3] for c in out.head.cls_scores])
            d = retina_get_bboxes(out.head, anchors, img_hw,
                                  scale_factor=scale_factors,
                                  score_thr=max(score_thr, 0.05),
                                  max_per_img=max_per_img, rescale=True,
                                  delta_stds=_stds)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch in ("fcos", "nasfcos"):
        from ..models.fcos import fcos_get_bboxes, fcos_points

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            points, _ = fcos_points(
                [c.shape[1:3] for c in out.head.cls_scores])
            d = fcos_get_bboxes(out.head, points, img_hw,
                                scale_factor=scale_factors,
                                score_thr=max(score_thr, 0.05),
                                max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch == "rpn":
        from ..models.faster_rcnn import rpn_proposals

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            props, scores, pvalid = rpn_proposals(
                out.rpn, img_hw, nms_pre=1000, max_total=max_per_img)
            return Det(props / scale_factors[:, None, :], scores,
                       jnp.zeros(scores.shape, jnp.int32), pvalid)
        return eval_step

    if arch == "fast_rcnn":
        from ..core.anchors import base_anchors, grid_anchors
        from ..models.faster_rcnn import FasterRCNN, rcnn_get_bboxes

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            # Fast R-CNN consumes EXTERNAL proposals (the reference reads
            # precomputed .pkl files, detectors/fast_rcnn.py). Absent
            # proposal files, a static multi-scale class-agnostic box
            # grid stands in (same documented stand-in as the train
            # branch, train/family.py fast_rcnn) — the RCNN head scores
            # and refines every grid box.
            out = model.apply(variables, images, img_hw, deterministic=True)
            B, H, W = images.shape[:3]
            grids = [grid_anchors((H // s, W // s), s,
                                  base_anchors(float(s), (4.0, 8.0),
                                               (0.5, 1.0, 2.0)))
                     for s in (16, 32, 64)]
            props = jnp.concatenate(grids, 0)
            step = max(1, props.shape[0] // 1000)
            props = props[::step][:1000]
            props = jnp.broadcast_to(props[None],
                                     (B,) + props.shape)
            pvalid = jnp.ones(props.shape[:2], bool)
            d = rcnn_get_bboxes(
                lambda f: model.apply(variables, f,
                                      method=FasterRCNN.roi_forward),
                out.neck_feats, props, pvalid, img_hw,
                num_classes=model.num_classes, scale_factor=scale_factors,
                score_thr=max(score_thr, 0.05), max_per_img=max_per_img,
                rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch == "ga_rpn":
        from ..models.guided_anchor import (GARPN_OCTAVE_SCALE,
                                            GARPN_STRIDES, ga_geometry,
                                            ga_get_bboxes)

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            centers, strides, _, _ = ga_geometry(
                [c.shape[1:3] for c in out.head.cls_scores],
                level_strides=GARPN_STRIDES,
                octave_scale=GARPN_OCTAVE_SCALE)
            d = ga_get_bboxes(out.head, centers, strides, img_hw,
                              scale_factor=scale_factors, score_thr=0.0,
                              nms_iou=0.7, max_per_img=max_per_img,
                              rescale=True,
                              sigma=float(GARPN_OCTAVE_SCALE),
                              shape_std=0.14,
                              bbox_stds=(0.07, 0.07, 0.11, 0.11))
            return Det(d["bboxes"], d["scores"],
                       jnp.zeros(d["scores"].shape, jnp.int32), d["valid"])
        return eval_step

    if arch == "cascade_rpn":
        from ..models.cascade_rpn_head import crpn_proposals

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            props, scores, pvalid = crpn_proposals(out, img_hw,
                                                   max_total=max_per_img)
            return Det(props / scale_factors[:, None, :], scores,
                       jnp.zeros(scores.shape, jnp.int32), pvalid)
        return eval_step

    if arch in ("faster_rcnn", "libra_faster_rcnn",
                "double_head_rcnn", "carafe_faster_rcnn",
                "pisa_faster_rcnn", "dynamic_rcnn",
                "faster_rcnn_gn_ws", "faster_rcnn_gn",
                "faster_rcnn_pafpn"):
        from ..models.faster_rcnn import (FasterRCNN, rcnn_get_bboxes,
                                          rpn_proposals)

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            props, _, pvalid = rpn_proposals(out.rpn, img_hw, nms_pre=1000,
                                             max_total=1000)
            extract_fn = None
            if getattr(model, "groie", False):
                from ..ops.roi_align import all_level_roi_align

                def extract_fn(fpi, r, v):
                    return model.apply(
                        variables, all_level_roi_align(fpi, r, v),
                        method=FasterRCNN.groie_forward)
            if getattr(model, "double_head", False):
                from ..models.faster_rcnn import double_head_extract_fn
                extract_fn = double_head_extract_fn
            d = rcnn_get_bboxes(
                lambda f: model.apply(variables, f,
                                      method=FasterRCNN.roi_forward),
                out.neck_feats, props, pvalid, img_hw,
                num_classes=model.num_classes, scale_factor=scale_factors,
                score_thr=max(score_thr, 0.05), max_per_img=max_per_img,
                rescale=True, extract_fn=extract_fn)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch in ("mask_rcnn", "mask_rcnn_seesaw"):
        from ..models.faster_rcnn import rcnn_get_bboxes, rpn_proposals
        from ..models.mask_rcnn import MaskRCNN, mask_rcnn_get_masks
        DetM = namedtuple("DetM",
                          ["bboxes", "scores", "labels", "valid", "masks"])
        seesaw = arch == "mask_rcnn_seesaw"

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            # box path identical to Faster R-CNN; then 14x14 RoIAlign on
            # the final det boxes -> mask head -> per-det label-channel
            # 28x28 probs (simple_test_mask); paste happens host-side
            out = model.apply(variables, images, img_hw, deterministic=True)
            props, _, pvalid = rpn_proposals(out.rpn, img_hw, nms_pre=1000,
                                             max_total=1000)
            d = rcnn_get_bboxes(
                lambda f: model.apply(variables, f,
                                      method=MaskRCNN.roi_forward),
                out.neck_feats, props, pvalid, img_hw,
                num_classes=model.num_classes, scale_factor=scale_factors,
                score_thr=max(score_thr, 0.05), max_per_img=max_per_img,
                rescale=True, seesaw=seesaw)
            rois_in = d["bboxes"] * scale_factors[:, None, :]  # input coords
            probs = mask_rcnn_get_masks(model, variables, out.neck_feats,
                                        rois_in, d["valid"])
            sel = jnp.take_along_axis(
                probs, jnp.clip(d["labels"], 0, probs.shape[-1] - 1)
                [:, :, None, None, None].astype(jnp.int32), axis=-1)[..., 0]
            return DetM(d["bboxes"], d["scores"], d["labels"], d["valid"],
                        sel)
        return eval_step

    if arch == "point_rend":
        from ..models.faster_rcnn import rcnn_get_bboxes, rpn_proposals
        from ..models.point_rend import (PointRendRCNN, refine_masks_test,
                                         simple_roi_align_p2)
        DetM = namedtuple("DetM",
                          ["bboxes", "scores", "labels", "valid", "masks"])

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            props, _, pvalid = rpn_proposals(out.rpn, img_hw, nms_pre=1000,
                                             max_total=1000)
            d = rcnn_get_bboxes(
                lambda f: model.apply(variables, f,
                                      method=PointRendRCNN.roi_forward),
                out.neck_feats, props, pvalid, img_hw,
                num_classes=model.num_classes, scale_factor=scale_factors,
                score_thr=max(score_thr, 0.05), max_per_img=max_per_img,
                rescale=True)
            rois_in = d["bboxes"] * scale_factors[:, None, :]
            B, R = rois_in.shape[:2]
            # SimpleRoIAlign(14) on P2 only, as in training
            f14 = jnp.concatenate([
                simple_roi_align_p2(out.neck_feats[0][b], rois_in[b],
                                    d["valid"][b]) for b in range(B)])
            coarse = model.apply(variables, f14,
                                 method=PointRendRCNN.coarse_forward)
            refined = refine_masks_test(
                lambda fi, cp: model.apply(
                    variables, fi, cp,
                    method=PointRendRCNN.point_forward),
                [f[0] for f in [out.neck_feats[0][b:b + 1]
                                for b in range(B)]],
                rois_in, d["valid"], d["labels"], coarse)
            probs = jax.nn.sigmoid(refined).reshape(
                B, R, refined.shape[1], refined.shape[2], -1)
            sel = jnp.take_along_axis(
                probs, jnp.clip(d["labels"], 0, probs.shape[-1] - 1)
                [:, :, None, None, None].astype(jnp.int32), axis=-1)[..., 0]
            return DetM(d["bboxes"], d["scores"], d["labels"], d["valid"],
                        sel)
        return eval_step

    if arch == "ms_rcnn":
        from ..models.faster_rcnn import rcnn_get_bboxes, rpn_proposals
        from ..models.ms_rcnn import MSRCNN
        from ..ops.roi_align import multi_level_roi_align
        DetS = namedtuple("DetS", ["bboxes", "scores", "labels", "valid",
                                   "masks", "mask_scores"])

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            # Mask R-CNN path + MaskIoU rescoring: segm detections are
            # ranked by cls_score * predicted mask IoU
            # (mask_scoring_roi_head.py simple_test_mask + maskiou_head
            # get_mask_scores)
            out = model.apply(variables, images, img_hw, deterministic=True)
            props, _, pvalid = rpn_proposals(out.rpn, img_hw, nms_pre=1000,
                                             max_total=1000)
            d = rcnn_get_bboxes(
                lambda f: model.apply(variables, f,
                                      method=MSRCNN.roi_forward),
                out.neck_feats, props, pvalid, img_hw,
                num_classes=model.num_classes, scale_factor=scale_factors,
                score_thr=max(score_thr, 0.05), max_per_img=max_per_img,
                rescale=True)
            rois_in = d["bboxes"] * scale_factors[:, None, :]
            B, R = rois_in.shape[:2]
            feats_pi = [tuple(f[b] for f in out.neck_feats[:4])
                        for b in range(B)]
            f14 = jnp.stack([
                multi_level_roi_align(feats_pi[b], rois_in[b], d["valid"][b],
                                      out_size=14) for b in range(B)])
            logits = model.apply(variables, f14.reshape(B * R, 14, 14, -1),
                                 method=MSRCNN.mask_forward)
            labf = jnp.clip(d["labels"].reshape(-1), 0,
                            logits.shape[-1] - 1).astype(jnp.int32)
            sel = jnp.take_along_axis(logits, labf[:, None, None, None],
                                      axis=-1)[..., 0]
            iou_pred = model.apply(variables,
                                   f14.reshape(B * R, 14, 14, -1), sel,
                                   method=MSRCNN.maskiou_forward)
            iou_sel = jnp.take_along_axis(iou_pred, labf[:, None],
                                          axis=-1).reshape(B, R)
            return DetS(d["bboxes"], d["scores"], d["labels"], d["valid"],
                        jax.nn.sigmoid(sel).reshape(B, R, 28, 28),
                        d["scores"] * jnp.clip(iou_sel, 0.0, 1.0))
        return eval_step

    if arch == "panoptic_fpn":
        from ..models.faster_rcnn import rcnn_get_bboxes, rpn_proposals
        from ..models.mask_rcnn import mask_rcnn_get_masks
        from ..models.panoptic_fpn import PanopticFPN
        DetP = namedtuple("DetP", ["bboxes", "scores", "labels", "valid",
                                   "masks", "seg"])

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            # Mask R-CNN box+mask path plus the semantic logits; the
            # heuristic panoptic fusion runs host-side (heuristic_fuse)
            out = model.apply(variables, images, img_hw, deterministic=True)
            props, _, pvalid = rpn_proposals(out.rpn, img_hw, nms_pre=1000,
                                             max_total=1000)
            d = rcnn_get_bboxes(
                lambda f: model.apply(variables, f,
                                      method=PanopticFPN.roi_forward),
                out.neck_feats, props, pvalid, img_hw,
                num_classes=model.num_classes, scale_factor=scale_factors,
                score_thr=max(score_thr, 0.05), max_per_img=max_per_img,
                rescale=True)
            rois_in = d["bboxes"] * scale_factors[:, None, :]
            probs = mask_rcnn_get_masks(model, variables, out.neck_feats,
                                        rois_in, d["valid"],
                                        method=PanopticFPN.mask_forward)
            sel = jnp.take_along_axis(
                probs, jnp.clip(d["labels"], 0, probs.shape[-1] - 1)
                [:, :, None, None, None].astype(jnp.int32), axis=-1)[..., 0]
            return DetP(d["bboxes"], d["scores"], d["labels"], d["valid"],
                        sel, out.seg_logits)
        return eval_step

    if arch == "tridentnet":
        from ..models.faster_rcnn import rcnn_get_bboxes, rpn_proposals
        from ..models.trident import TridentFasterRCNN
        scales = TridentFasterRCNN.anchor_scales()

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            # deploy fast path: single branch (dilation 2), plain C4 cost
            out = model.apply(variables, images, img_hw, deterministic=True)
            props, _, pvalid = rpn_proposals(out.rpn, img_hw, nms_pre=1000,
                                             max_total=500, strides=(16,),
                                             scales=scales)
            d = rcnn_get_bboxes(
                lambda f: model.apply(
                    variables, f, method=TridentFasterRCNN.roi_forward),
                (out.c4,), props, pvalid, img_hw,
                num_classes=model.num_classes, scale_factor=scale_factors,
                score_thr=max(score_thr, 0.05), max_per_img=max_per_img,
                rescale=True, strides=(16,), out_size=14)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch in ("cascade_rcnn", "detectors_cascade_rcnn"):
        from ..models.cascade_rcnn import CascadeRCNN, cascade_get_bboxes
        from ..models.faster_rcnn import rpn_proposals

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            props, _, pvalid = rpn_proposals(out.rpn, img_hw, nms_pre=1000,
                                             max_total=1000)
            d = cascade_get_bboxes(
                lambda f, st: model.apply(variables, f, st,
                                          method=CascadeRCNN.roi_forward),
                out.neck_feats, props, pvalid, img_hw,
                num_classes=model.num_classes, scale_factor=scale_factors,
                score_thr=max(score_thr, 0.05), max_per_img=max_per_img,
                rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch == "solo":
        from ..models.solo import solo_decode
        DetM = namedtuple("DetM",
                          ["bboxes", "scores", "labels", "valid", "masks"])

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            d = solo_decode(out, tuple(images.shape[1:3]),
                            num_classes=model.num_classes,
                            score_thr=max(score_thr, 0.05),
                            nms_pre=max(max_per_img, 500),
                            max_per_img=max_per_img)
            return DetM(d["bboxes"] / scale_factors[:, None, :],
                        d["scores"], d["labels"], d["valid"], d["masks28"])
        return eval_step

    if arch in ("maskformer", "mask2former"):
        from ..models.maskformer import maskformer_decode
        DetM = namedtuple("DetM",
                          ["bboxes", "scores", "labels", "valid", "masks"])

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            d = maskformer_decode(out, num_classes=model.num_classes,
                                  max_per_img=max_per_img)
            return DetM(d["bboxes"] / scale_factors[:, None, :],
                        d["scores"], d["labels"], d["valid"], d["masks28"])
        return eval_step

    if arch == "yolact":
        from ..models.yolact import yolact_anchors, yolact_decode
        DetM = namedtuple("DetM",
                          ["bboxes", "scores", "labels", "valid", "masks"])

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            sizes = [tuple(c.shape[1:3]) for c in out.head.cls_scores]
            anchors = yolact_anchors(sizes)
            d = yolact_decode(out, anchors, img_hw,
                              num_classes=model.num_classes,
                              score_thr=max(score_thr, 0.05),
                              max_per_img=max_per_img)
            return DetM(d["bboxes"] / scale_factors[:, None, :],
                        d["scores"], d["labels"], d["valid"], d["masks28"])
        return eval_step

    if arch == "cascade_mask_rcnn":
        from ..models.cascade_mask_rcnn import cascade_mask_probs
        from ..models.cascade_rcnn import CascadeRCNN, cascade_get_bboxes
        from ..models.faster_rcnn import rpn_proposals
        DetM = namedtuple("DetM",
                          ["bboxes", "scores", "labels", "valid", "masks"])

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            props, _, pvalid = rpn_proposals(out.rpn, img_hw, nms_pre=1000,
                                             max_total=1000)
            d = cascade_get_bboxes(
                lambda f, st: model.apply(variables, f, st,
                                          method=CascadeRCNN.roi_forward),
                out.neck_feats, props, pvalid, img_hw,
                num_classes=model.num_classes, scale_factor=scale_factors,
                score_thr=max(score_thr, 0.05), max_per_img=max_per_img,
                rescale=True)
            rois_in = d["bboxes"] * scale_factors[:, None, :]
            probs = cascade_mask_probs(model, variables, out.neck_feats,
                                       rois_in, d["valid"])
            sel = jnp.take_along_axis(
                probs, jnp.clip(d["labels"], 0, probs.shape[-1] - 1)
                [:, :, None, None, None].astype(jnp.int32), axis=-1)[..., 0]
            return DetM(d["bboxes"], d["scores"], d["labels"], d["valid"],
                        sel)
        return eval_step

    if arch == "htc":
        from ..models.faster_rcnn import rpn_proposals
        from ..models.htc import HTC, htc_get_bboxes, htc_mask_probs
        DetM = namedtuple("DetM",
                          ["bboxes", "scores", "labels", "valid", "masks"])

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            props, _, pvalid = rpn_proposals(out.rpn, img_hw, nms_pre=1000,
                                             max_total=1000)
            d = htc_get_bboxes(
                lambda f, st: model.apply(variables, f, st,
                                          method=HTC.roi_forward),
                out, props, pvalid, img_hw,
                num_classes=model.num_classes, scale_factor=scale_factors,
                score_thr=max(score_thr, 0.05), max_per_img=max_per_img,
                rescale=True)
            rois_in = d["bboxes"] * scale_factors[:, None, :]
            probs = htc_mask_probs(model, variables, out, rois_in,
                                   d["valid"])
            sel = jnp.take_along_axis(
                probs, jnp.clip(d["labels"], 0, probs.shape[-1] - 1)
                [:, :, None, None, None].astype(jnp.int32), axis=-1)[..., 0]
            return DetM(d["bboxes"], d["scores"], d["labels"], d["valid"],
                        sel)
        return eval_step

    if arch == "scnet":
        from ..models.faster_rcnn import rpn_proposals
        from ..models.scnet import (SCNet, scnet_get_bboxes,
                                    scnet_mask_probs)
        DetM = namedtuple("DetM",
                          ["bboxes", "scores", "labels", "valid", "masks"])

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            props, _, pvalid = rpn_proposals(out.rpn, img_hw, nms_pre=1000,
                                             max_total=1000)
            d = scnet_get_bboxes(
                lambda f, st: model.apply(variables, f, st,
                                          method=SCNet.roi_forward),
                out, props, pvalid, img_hw,
                num_classes=model.num_classes, scale_factor=scale_factors,
                score_thr=max(score_thr, 0.05), max_per_img=max_per_img,
                rescale=True)
            rois_in = d["bboxes"] * scale_factors[:, None, :]
            probs = scnet_mask_probs(model, variables, out, rois_in,
                                     d["valid"], d["shared"])
            sel = jnp.take_along_axis(
                probs, jnp.clip(d["labels"], 0, probs.shape[-1] - 1)
                [:, :, None, None, None].astype(jnp.int32), axis=-1)[..., 0]
            return DetM(d["bboxes"], d["scores"], d["labels"], d["valid"],
                        sel)
        return eval_step

    if arch == "centernet":
        from ..models.centernet import centernet_get_bboxes

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            d = centernet_get_bboxes(out, img_hw,
                                     scale_factor=scale_factors,
                                     score_thr=max(score_thr, 0.05),
                                     topk=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch in ("ssd", "pisa_ssd"):
        from ..models.ssd import ssd_anchors, ssd_get_bboxes
        ssd_size = getattr(model, "input_size", 300)

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            anchors = ssd_anchors([c.shape[1:3] for c in out.cls_scores],
                                  input_size=ssd_size)
            d = ssd_get_bboxes(out, anchors, img_hw,
                               scale_factor=scale_factors,
                               score_thr=max(score_thr, 0.02),
                               max_per_img=max_per_img, rescale=True,
                               input_size=ssd_size)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch == "yolov3":
        from ..models.yolov3 import yolov3_get_bboxes

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            d = yolov3_get_bboxes(out, img_hw, scale_factor=scale_factors,
                                  score_thr=max(score_thr, 0.05),
                                  max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch == "atss":
        from ..models.atss import atss_anchors, atss_get_bboxes

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            anchors, _ = atss_anchors(
                [c.shape[1:3] for c in out.head.cls_scores])
            d = atss_get_bboxes(out.head, anchors, img_hw,
                                scale_factor=scale_factors,
                                score_thr=max(score_thr, 0.05),
                                max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch == "detr":
        from ..models.detr import detr_get_bboxes

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            d = detr_get_bboxes(out, img_hw, score_thr=score_thr,
                                max_per_img=max_per_img,
                                scale_factor=scale_factors, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch == "reppoints":
        from ..models.reppoints import reppoints_get_bboxes

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            d = reppoints_get_bboxes(out.head, out.moment, img_hw,
                                     scale_factor=scale_factors,
                                     score_thr=max(score_thr, 0.05),
                                     max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch == "autoassign":
        from ..models.autoassign import autoassign_get_bboxes

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            d = autoassign_get_bboxes(out.head, img_hw,
                                      scale_factor=scale_factors,
                                      score_thr=max(score_thr, 0.05),
                                      max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch in ("paa", "lad"):
        from ..models.paa import paa_anchors, paa_get_bboxes

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            anchors, _ = paa_anchors(
                [c.shape[1:3] for c in out.head.cls_scores])
            d = paa_get_bboxes(out.head, anchors, img_hw,
                               scale_factor=scale_factors,
                               score_thr=max(score_thr, 0.05),
                               max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch == "ga_retina":
        from ..models.guided_anchor import ga_geometry, ga_get_bboxes

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            centers, strides, _, _ = ga_geometry(
                [c.shape[1:3] for c in out.head.cls_scores])
            d = ga_get_bboxes(out.head, centers, strides, img_hw,
                              scale_factor=scale_factors,
                              score_thr=max(score_thr, 0.05),
                              max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch == "sabl_retina":
        from ..models.sabl_retina import sabl_anchors, sabl_get_bboxes

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            squares, _ = sabl_anchors(
                [c.shape[1:3] for c in out.head.cls_scores])
            d = sabl_get_bboxes(out.head, squares, img_hw,
                                scale_factor=scale_factors,
                                score_thr=max(score_thr, 0.05),
                                max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch == "grid_rcnn":
        from ..core.postprocess import batched_nms
        from ..models.faster_rcnn import rpn_proposals
        from ..models.grid_rcnn import (GridRCNN, extend_rois,
                                        grid_decode)
        from ..ops.roi_align import multi_level_roi_align

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            props, _, pvalid = rpn_proposals(out.rpn, img_hw,
                                             nms_pre=1000, max_total=256)
            B = props.shape[0]

            def per_image(feats, rois, rv, hw, sf):
                f7 = multi_level_roi_align(feats, rois, rv)
                cls_logits, _ = model.apply(variables, f7,
                                            method=GridRCNN.roi_forward)
                p = jax.nn.softmax(cls_logits, -1)[:, :-1]
                p = jnp.where(rv[:, None], p, 0.0)
                scores = p.max(-1)
                labels = p.argmax(-1).astype(jnp.int32)
                k = min(max_per_img, rois.shape[0])
                top_s, keep = jax.lax.top_k(scores, k)
                rois_k = rois[keep]
                erois = extend_rois(rois_k)
                f14 = multi_level_roi_align(feats, erois, rv[keep],
                                            out_size=14)
                grid_pred = model.apply(variables, f14,
                                        method=GridRCNN.grid_forward)
                boxes = grid_decode(grid_pred["fused"], erois)
                h = hw[0].astype(boxes.dtype)
                w = hw[1].astype(boxes.dtype)
                boxes = jnp.stack([
                    jnp.clip(boxes[:, 0], 0, w),
                    jnp.clip(boxes[:, 1], 0, h),
                    jnp.clip(boxes[:, 2], 0, w),
                    jnp.clip(boxes[:, 3], 0, h)], -1)
                nb, ns, nl, kp, _ = batched_nms(
                    boxes, jnp.where(top_s > max(score_thr, 0.05),
                                     top_s, 0.0),
                    labels[keep], 0.5, max_per_img, valid=top_s > 0.0)
                return nb / sf[None], ns, nl, kp

            feats_pi = [tuple(f[b] for f in out.neck_feats[:4])
                        for b in range(B)]
            rs = [per_image(feats_pi[b], props[b], pvalid[b], img_hw[b],
                            scale_factors[b]) for b in range(B)]
            return Det(jnp.stack([r[0] for r in rs]),
                       jnp.stack([r[1] for r in rs]),
                       jnp.stack([r[2] for r in rs]),
                       jnp.stack([r[3] for r in rs]))
        return eval_step

    if arch == "sparse_rcnn":
        from ..models.sparse_rcnn import sparse_rcnn_get_bboxes

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            d = sparse_rcnn_get_bboxes(out, img_hw,
                                       scale_factor=scale_factors,
                                       score_thr=score_thr,
                                       max_per_img=max_per_img,
                                       rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch == "queryinst":
        from ..models.queryinst import queryinst_masks
        from ..models.sparse_rcnn import sparse_rcnn_get_bboxes
        DetM = namedtuple("DetM",
                          ["bboxes", "scores", "labels", "valid", "masks"])

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            d = sparse_rcnn_get_bboxes(out, img_hw,
                                       scale_factor=scale_factors,
                                       score_thr=score_thr,
                                       max_per_img=max_per_img,
                                       rescale=True)
            rois_in = d["bboxes"] * scale_factors[:, None, :]
            probs = queryinst_masks(model, variables, out, rois_in,
                                    d["qidx"], d["valid"])
            sel = jnp.take_along_axis(
                probs, jnp.clip(d["labels"], 0, probs.shape[-1] - 1)
                [:, :, None, None, None].astype(jnp.int32), axis=-1)[..., 0]
            return DetM(d["bboxes"], d["scores"], d["labels"], d["valid"],
                        sel)
        return eval_step

    if arch == "centripetalnet":
        from ..models.centripetal import centripetalnet_get_bboxes

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            d = centripetalnet_get_bboxes(
                out.head, img_hw, scale_factor=scale_factors,
                score_thr=max(score_thr, 0.05),
                max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch == "cornernet":
        from ..models.cornernet import cornernet_get_bboxes

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            d = cornernet_get_bboxes(out.head, img_hw,
                                     scale_factor=scale_factors,
                                     score_thr=max(score_thr, 0.05),
                                     max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch in ("foveabox", "fsaf"):
        if arch == "foveabox":
            from ..models.foveabox import fovea_get_bboxes as _decode
        else:
            from ..models.fsaf import fsaf_get_bboxes as _decode

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            d = _decode(out.head, img_hw, scale_factor=scale_factors,
                        score_thr=max(score_thr, 0.05),
                        max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch == "vfnet":
        from ..models.vfnet import vfnet_get_bboxes, vfnet_points

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            points, _, _ = vfnet_points(
                [c.shape[1:3] for c in out.head.cls_scores])
            d = vfnet_get_bboxes(out.head, points, img_hw,
                                 scale_factor=scale_factors,
                                 score_thr=max(score_thr, 0.05),
                                 max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch == "tood":
        from ..models.tood import tood_get_bboxes, tood_points

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            points, _, _ = tood_points(
                [c.shape[1:3] for c in out.head.cls_scores])
            d = tood_get_bboxes(out.head, points, img_hw,
                                scale_factor=scale_factors,
                                score_thr=max(score_thr, 0.05),
                                max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    if arch == "deformable_detr":
        from ..models.deformable_detr import deformable_detr_get_bboxes

        @jax.jit
        def eval_step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw, deterministic=True)
            d = deformable_detr_get_bboxes(
                out.head, img_hw, score_thr=score_thr,
                max_per_img=max_per_img, scale_factor=scale_factors,
                rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return eval_step

    raise ValueError(f"no eval step for arch: {arch}")


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

"""Per-family train-step construction (the registry glue between the
incremental driver and each detector family's loss stack)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.config import ExperimentConfig
from .state import TrainState
from .step import Batch, parse_losses



def _teacher_model(model, cfg: ExperimentConfig):
    """The frozen teacher's module for KD families: the student's module
    unless model.teacher_depth differs (r18 student <- r101 teacher,
    configs/ld + configs/lad)."""
    td = cfg.model.teacher_depth
    if not td or td == cfg.model.depth:
        return model
    from .incremental import build_teacher_model
    return build_teacher_model(cfg)


def make_family_train_step(arch: str, model, cfg: ExperimentConfig,
                           num_prev: int, has_teacher: bool,
                           use_dropout: bool = True,
                           compute_dtype=jnp.float32,
                           use_l1: bool = False):
    """Returns a jitted (state, batch, teacher_vars) -> (state, losses).

    ``use_l1`` is YOLOX's ModeSwitch extra: the driver rebuilds the step
    with it on when the no-aug phase starts (detectors/yolox.py +
    YOLOXModeSwitchHook)."""
    from ..registry import get_family
    spec = get_family(arch)
    if spec is not None and spec.get("losses") is not None:
        return _jit_family_step(spec["losses"](
            model, cfg, num_prev=num_prev, has_teacher=has_teacher,
            use_l1=use_l1))

    if arch in ("gfl_deformable_detr", "deformable_detr_il"):
        from ..distill.losses import DistillConfig
        from ..models.gfl_detr_loss import DetLossConfig
        from .step import make_train_step
        det_cfg = DetLossConfig(num_classes=cfg.model.num_classes,
                                reg_max=cfg.model.reg_max)
        distill_cfg = None
        if has_teacher:
            distill_cfg = DistillConfig.from_flags(
                cates_distill=cfg.distill.cates_distill,
                locat_distill=cfg.distill.locat_distill,
                feats_distill=cfg.distill.feats_distill,
                memory_distill=cfg.distill.memory_distill,
                num_prev=max(num_prev, 1), reg_max=cfg.model.reg_max,
                fix_fg_grad_direction=cfg.distill.fix_fg_grad_direction)
        return make_train_step(
            model, det_cfg, distill_cfg,
            teacher_score_thr=cfg.distill.teacher_score_thr,
            teacher_max_per_img=cfg.distill.teacher_max_per_img,
            use_dropout=use_dropout, compute_dtype=compute_dtype)

    if arch == "yolof":
        from ..models.yolof import (YOLOFDistillConfig,
                                    yolof_compute_losses)
        from ..models.yolof_head import YOLOFLossConfig, yolof_anchors
        det_cfg = YOLOFLossConfig(num_classes=cfg.model.num_classes)
        distill_cfg = YOLOFDistillConfig.from_flags(
            cates_distill=cfg.distill.cates_distill,
            locat_distill=cfg.distill.locat_distill,
            feats_distill=cfg.distill.feats_distill) if has_teacher else None

        def losses_fn(variables, batch, teacher_vars, rng):
            # train-mode apply: BN uses batch statistics and UPDATES the
            # running stats (the reference trains these BNs —
            # necks/dilated_encoder.py:108 norm requires_grad=True); the
            # frozen teacher keeps its running stats (deterministic=True).
            out, mutated = model.apply(
                variables, batch.images, batch.img_hw, deterministic=False,
                mutable=["batch_stats"])
            anchors = yolof_anchors(out.head.feat_hw)
            t_out = None
            if teacher_vars is not None:
                t_out = model.apply(teacher_vars, batch.images,
                                    batch.img_hw, deterministic=True)
            losses = yolof_compute_losses(
                out, anchors, batch, det_cfg, teacher_out=t_out,
                distill_cfg=distill_cfg,
                teacher_score_thr=cfg.distill.teacher_score_thr,
                teacher_max_per_img=cfg.distill.teacher_max_per_img)
            return losses, mutated["batch_stats"]

    elif arch == "yoloy":
        from ..models.yoloy import YOLOYDistillConfig, yoloy_compute_losses
        from ..models.yoloy_head import YOLOYLossConfig
        det_cfg = YOLOYLossConfig(num_classes=cfg.model.num_classes)
        distill_cfg = YOLOYDistillConfig.from_flags(
            cates_distill=cfg.distill.cates_distill,
            feats_distill=cfg.distill.feats_distill) if has_teacher else None

        def losses_fn(variables, batch, teacher_vars, rng):
            out, mutated = model.apply(
                variables, batch.images, batch.img_hw, deterministic=False,
                mutable=["batch_stats"])
            t_out = None
            if teacher_vars is not None:
                t_out = model.apply(teacher_vars, batch.images,
                                    batch.img_hw, deterministic=True)
            losses = yoloy_compute_losses(
                out, batch, det_cfg, teacher_out=t_out,
                distill_cfg=distill_cfg,
                teacher_score_thr=cfg.distill.teacher_score_thr,
                teacher_max_per_img=cfg.distill.teacher_max_per_img)
            return losses, mutated["batch_stats"]

    elif arch == "yolox":
        from ..models.yoloy_head import YOLOYLossConfig, yoloy_detection_loss
        det_cfg = YOLOYLossConfig(num_classes=cfg.model.num_classes,
                                  bbox_loss="square_iou", use_l1=use_l1)

        def losses_fn(variables, batch, teacher_vars, rng):
            out, mutated = model.apply(
                variables, batch.images, batch.img_hw, deterministic=False,
                mutable=["batch_stats"])
            return yoloy_detection_loss(
                out.head, batch.gt_bboxes, batch.gt_labels, batch.gt_valid,
                det_cfg), mutated["batch_stats"]

    elif arch == "gfl":
        from ..models.gfl_head import GFLLossConfig, gfl_detection_loss
        det_cfg = GFLLossConfig(num_classes=cfg.model.num_classes,
                                reg_max=cfg.model.reg_max)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            return gfl_detection_loss(out.head, batch.gt_bboxes,
                                      batch.gt_labels, batch.gt_valid,
                                      det_cfg), None

    elif arch == "ld":
        from ..models.gfl_head import GFLLossConfig
        from ..models.ld import LDLossConfig, ld_loss
        det_cfg = LDLossConfig(
            gfl=GFLLossConfig(num_classes=cfg.model.num_classes,
                              reg_max=cfg.model.reg_max))
        t_model = _teacher_model(model, cfg)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            assert teacher_vars is not None, \
                "arch='ld' requires a frozen teacher (kd_one_stage.py)"
            t_out = t_model.apply(teacher_vars, batch.images,
                                  batch.img_hw, deterministic=True)
            return ld_loss(out.head, t_out.head, batch.gt_bboxes,
                           batch.gt_labels, batch.gt_valid, det_cfg), None

    elif arch == "detr":
        from ..models.detr import (DETRDistillConfig, DETRLossConfig,
                                   detr_compute_losses)
        det_cfg = DETRLossConfig(num_classes=cfg.model.num_classes)
        distill_cfg = DETRDistillConfig.from_flags(
            cates_distill=cfg.distill.cates_distill,
            feats_distill=cfg.distill.feats_distill) if has_teacher else None

        def losses_fn(variables, batch, teacher_vars, rng):
            # the reference trains vanilla DETR WITH dropout=0.1
            # (configs/detr/detr_r50_8x2_150e_coco.py); the frozen teacher
            # forward stays deterministic
            out = model.apply(
                variables, batch.images, batch.img_hw,
                deterministic=not use_dropout,
                rngs={"dropout": rng} if use_dropout else None)
            t_out = None
            if teacher_vars is not None:
                t_out = model.apply(teacher_vars, batch.images,
                                    batch.img_hw, deterministic=True)
            return detr_compute_losses(
                out, batch, det_cfg, teacher_out=t_out,
                distill_cfg=distill_cfg,
                teacher_score_thr=cfg.distill.teacher_score_thr,
                teacher_max_per_img=cfg.distill.teacher_max_per_img), None

    elif arch == "deformable_detr":
        from ..models.deformable_detr import (DDETRLossConfig,
                                              deformable_detr_loss)
        det_cfg = DDETRLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(
                variables, batch.images, batch.img_hw,
                deterministic=not use_dropout,
                rngs={"dropout": rng} if use_dropout else None)
            return deformable_detr_loss(
                out.head, batch.gt_bboxes, batch.gt_labels, batch.gt_valid,
                batch.img_hw, det_cfg), None

    elif arch in ("retinanet", "pisa_retinanet", "retinanet_ghm",
                  "retinanet_fpg", "retinanet_nasfpn"):
        from ..models.retinanet import (RetinaLossConfig, retina_anchors,
                                        retina_detection_loss)
        pisa = arch == "pisa_retinanet"
        # per-level BN heads: NAS-FPN and the EfficientNet recipe
        sepbn = (arch == "retinanet_nasfpn"
                 or cfg.model.backbone.startswith("effb"))
        ghm = arch == "retinanet_ghm"
        # GHM recipe swaps Focal+L1 for GHMC + GHMR(loss_weight=10)
        # (configs/ghm/retinanet_ghm_r50_fpn_1x_coco.py); the effb recipe
        # raises the assigner's neg_iou_thr 0.4 -> 0.5
        # (configs/efficientnet/retinanet_effb3...py train_cfg)
        det_cfg = RetinaLossConfig(num_classes=cfg.model.num_classes,
                                   ghm=ghm,
                                   neg_iou_thr=0.5
                                   if cfg.model.backbone.startswith("effb")
                                   else 0.4,
                                   loss_bbox_weight=10.0 if ghm else 1.0)

        # swin/pvt backbones carry stochastic depth (no BN to mutate)
        stoch_bb = cfg.model.backbone.startswith(("swin", "pvt"))

        def losses_fn(variables, batch, teacher_vars, rng):
            if sepbn:
                # RetinaSepBNHead trains its per-level BN statistics;
                # the rng feeds EfficientNet's drop_path when present
                out, mutated = model.apply(
                    variables, batch.images, batch.img_hw,
                    deterministic=False, mutable=["batch_stats"],
                    rngs={"dropout": rng})
                stats = mutated["batch_stats"]
            elif stoch_bb:
                out = model.apply(variables, batch.images, batch.img_hw,
                                  deterministic=False,
                                  rngs={"dropout": rng})
                stats = None
            else:
                out = model.apply(variables, batch.images, batch.img_hw,
                                  deterministic=True)
                stats = None
            anchors = retina_anchors(
                [c.shape[1:3] for c in out.head.cls_scores])
            if ghm:
                # thread the GHM EMA bin counts through batch_stats —
                # START from the mutable-apply stats when sepbn also ran
                # (a ghm+effb combo would otherwise discard the SepBN /
                # backbone BN updates and freeze them at init)
                bs = variables["batch_stats"]
                losses, new_ghm = retina_detection_loss(
                    out.head, anchors, batch.gt_bboxes, batch.gt_labels,
                    batch.gt_valid, det_cfg,
                    ghm_state={"acc_c": bs["ghm_acc_c"],
                               "acc_r": bs["ghm_acc_r"]})
                new_bs = dict(stats if stats is not None else bs)
                new_bs["ghm_acc_c"] = new_ghm["acc_c"]
                new_bs["ghm_acc_r"] = new_ghm["acc_r"]
                return losses, new_bs
            return retina_detection_loss(
                out.head, anchors, batch.gt_bboxes, batch.gt_labels,
                batch.gt_valid, det_cfg, pisa=pisa), stats

    elif arch in ("fcos", "nasfcos"):
        from ..models.fcos import (FCOSLossConfig, fcos_detection_loss,
                                   fcos_points)
        det_cfg = FCOSLossConfig(num_classes=cfg.model.num_classes)
        stoch_bb = cfg.model.backbone.startswith(("effb", "swin", "pvt"))

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=not stoch_bb,
                              rngs={"dropout": rng} if stoch_bb else None)
            points, meta = fcos_points(
                [c.shape[1:3] for c in out.head.cls_scores])
            return fcos_detection_loss(
                out.head, points, meta, batch.gt_bboxes, batch.gt_labels,
                batch.gt_valid, det_cfg), None

    elif arch == "rpn":
        from ..models.faster_rcnn import RPNLossConfig, rpn_loss
        rpn_cfg = RPNLossConfig()

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw)
            return rpn_loss(out.rpn, batch.gt_bboxes, batch.gt_valid,
                            batch.img_hw, rng, rpn_cfg), None

    elif arch == "ga_rpn":
        from ..models.guided_anchor import (GALossConfig, GARPN_STRIDES,
                                            GARPN_OCTAVE_SCALE,
                                            ga_geometry, ga_loss)
        det_cfg = GALossConfig(
            num_classes=1, focal_cls=False, smooth_beta=1.0,
            strides=GARPN_STRIDES, octave_scale=GARPN_OCTAVE_SCALE,
            anchor_sigma=float(GARPN_OCTAVE_SCALE), shape_std=0.14,
            bbox_stds=(0.07, 0.07, 0.11, 0.11),
            ga_pos=0.7, ga_neg=0.3, ga_min_pos=0.3,
            pos_iou=0.7, neg_iou=0.3, min_pos_iou=0.3)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            centers, strides, approxs, counts = ga_geometry(
                [c.shape[1:3] for c in out.head.cls_scores],
                level_strides=GARPN_STRIDES,
                octave_scale=GARPN_OCTAVE_SCALE)
            return ga_loss(out.head, centers, strides, approxs, counts,
                           batch.gt_bboxes,
                           jnp.zeros_like(batch.gt_labels),
                           batch.gt_valid, det_cfg, rng), None

    elif arch == "cascade_rpn":
        from ..models.cascade_rpn_head import crpn_loss

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw)
            return crpn_loss(out, batch.gt_bboxes, batch.gt_valid,
                             rng), None

    elif arch in ("faster_rcnn", "libra_faster_rcnn",
                  "double_head_rcnn", "carafe_faster_rcnn",
                  "pisa_faster_rcnn", "dynamic_rcnn",
                  "faster_rcnn_gn_ws", "faster_rcnn_gn",
                  "faster_rcnn_pafpn"):
        from ..models.faster_rcnn import (FasterRCNN, RCNNLossConfig,
                                          RPNLossConfig, rcnn_forward_train,
                                          rpn_loss, rpn_proposals)
        rpn_cfg = RPNLossConfig()
        libra = arch == "libra_faster_rcnn"
        dh = arch == "double_head_rcnn"
        rcnn_cfg = RCNNLossConfig(num_classes=cfg.model.num_classes,
                                  num_samples=cfg.rcnn_num_samples,
                                  balanced_l1=libra,
                                  iou_balanced_neg=libra,
                                  # Double-Head: 2.0 cls/bbox weights +
                                  # SmoothL1 beta 1 (configs/double_heads)
                                  loss_cls_weight=2.0 if dh else 1.0,
                                  loss_bbox_weight=2.0 if dh else 1.0,
                                  smooth_l1_beta=1.0 if dh else 0.0,
                                  pisa=(arch == "pisa_faster_rcnn"),
                                  isr_n=(arch == "pisa_faster_rcnn"),
                                  dynamic=(arch == "dynamic_rcnn"))
        stoch_bb = cfg.model.backbone.startswith(("effb", "swin", "pvt"))

        def losses_fn(variables, batch, teacher_vars, rng):
            rng1, rng2, rng3 = jax.random.split(rng, 3)
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=not stoch_bb,
                              rngs={"dropout": rng3} if stoch_bb else None)
            losses = rpn_loss(out.rpn, batch.gt_bboxes, batch.gt_valid,
                              batch.img_hw, rng1, rpn_cfg)
            # proposals are detached (the reference never backprops
            # through NMS'd proposals into the RPN)
            props, _, valid = rpn_proposals(out.rpn, batch.img_hw,
                                            nms_pre=1000,
                                            max_total=cfg.rcnn_num_proposals)
            props = jax.lax.stop_gradient(props)
            extract_fn = None
            if getattr(model, "groie", False):
                from ..ops.roi_align import all_level_roi_align

                def extract_fn(fpi, r, v):
                    return model.apply(
                        variables, all_level_roi_align(fpi, r, v),
                        method=FasterRCNN.groie_forward)
            head_apply = lambda f: model.apply(
                variables, f, method=FasterRCNN.roi_forward)
            mut_stats = {}
            if dh:
                from ..models.faster_rcnn import double_head_extract_fn
                extract_fn = double_head_extract_fn

                def head_apply(f):
                    (c, r), mut = model.apply(
                        variables, f, True,
                        method=FasterRCNN.roi_forward,
                        mutable=["batch_stats"])
                    mut_stats["bs"] = mut["batch_stats"]
                    return c, r
            rcnn_losses, _ = rcnn_forward_train(
                head_apply,
                out.neck_feats, props, valid, batch.gt_bboxes,
                batch.gt_labels, batch.gt_valid, rng2, rcnn_cfg,
                extract_fn=extract_fn)
            losses.update({f"rcnn_{k}": v for k, v in rcnn_losses.items()})
            if dh:
                # merge the head's updated BN stats over the frozen
                # backbone stats so the train step can thread them
                bs = dict(variables.get("batch_stats", {}))
                bs.update(mut_stats["bs"])
                return losses, bs
            return losses, None

    elif arch in ("mask_rcnn", "mask_rcnn_seesaw", "panoptic_fpn",
                  "ms_rcnn"):
        from ..models.faster_rcnn import (RCNNLossConfig, RPNLossConfig,
                                          rcnn_forward_train, rpn_loss,
                                          rpn_proposals)
        from ..models.mask_rcnn import mask_loss, mask_targets
        from ..ops.roi_align import multi_level_roi_align
        rpn_cfg = RPNLossConfig()
        seesaw = arch == "mask_rcnn_seesaw"
        rcnn_cfg = RCNNLossConfig(num_classes=cfg.model.num_classes,
                                  num_samples=cfg.rcnn_num_samples,
                                  seesaw=seesaw)
        mask_stride = getattr(cfg, "mask_stride", 4)
        panoptic = arch == "panoptic_fpn"
        mask_scoring = arch == "ms_rcnn"

        stoch_bb = cfg.model.backbone.startswith(("effb", "swin", "pvt"))

        def losses_fn(variables, batch, teacher_vars, rng):
            rng1, rng2, rng3 = jax.random.split(rng, 3)
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=not stoch_bb,
                              rngs={"dropout": rng3} if stoch_bb else None)
            losses = rpn_loss(out.rpn, batch.gt_bboxes, batch.gt_valid,
                              batch.img_hw, rng1, rpn_cfg)
            props, _, valid = rpn_proposals(out.rpn, batch.img_hw,
                                            nms_pre=1000,
                                            max_total=cfg.rcnn_num_proposals)
            props = jax.lax.stop_gradient(props)
            new_bs = None
            if seesaw:
                bs = variables["batch_stats"]
                rcnn_losses, samples, new_cum = rcnn_forward_train(
                    lambda f: model.apply(variables, f,
                                          method=type(model).roi_forward),
                    out.neck_feats, props, valid, batch.gt_bboxes,
                    batch.gt_labels, batch.gt_valid, rng2, rcnn_cfg,
                    seesaw_cum=bs["seesaw_cum"])
                new_bs = dict(bs)
                new_bs["seesaw_cum"] = new_cum
            else:
                rcnn_losses, samples = rcnn_forward_train(
                    lambda f: model.apply(variables, f,
                                          method=type(model).roi_forward),
                    out.neck_feats, props, valid, batch.gt_bboxes,
                    batch.gt_labels, batch.gt_valid, rng2, rcnn_cfg)
            losses.update({f"rcnn_{k}": v for k, v in rcnn_losses.items()})

            # mask branch on the leading positive slots (pos-first layout)
            B = props.shape[0]
            P = max(1, int(rcnn_cfg.num_samples * rcnn_cfg.pos_fraction))
            rois_p = samples.rois[:, :P]
            pos_v = samples.is_pos[:, :P]
            lab_p = samples.labels[:, :P]
            gi_p = samples.gt_idx[:, :P]
            feats_pi = [tuple(f[b] for f in out.neck_feats[:4])
                        for b in range(B)]
            f14 = jnp.stack([
                multi_level_roi_align(feats_pi[b], rois_p[b], pos_v[b],
                                      out_size=14) for b in range(B)])
            logits = model.apply(variables,
                                 f14.reshape(B * P, 14, 14, -1),
                                 method=type(model).mask_forward)
            gm = jax.vmap(lambda m, i: m[i])(batch.gt_masks, gi_p)
            tgt = mask_targets(rois_p.reshape(-1, 4),
                               gm.reshape((B * P,) + gm.shape[2:]),
                               mask_stride)
            losses["loss_mask"] = mask_loss(
                logits, jax.lax.stop_gradient(tgt),
                lab_p.reshape(-1), pos_v.reshape(-1))
            if mask_scoring:
                # MaskIoU head on the same positives (mask_scoring_roi_
                # head.py _mask_forward_train)
                from ..models.ms_rcnn import (MSRCNN, maskiou_loss,
                                              maskiou_targets)
                labf = jnp.clip(lab_p.reshape(-1), 0,
                                logits.shape[-1] - 1)
                sel = jnp.take_along_axis(
                    logits, labf[:, None, None, None], axis=-1)[..., 0]
                iou_pred = model.apply(
                    variables, f14.reshape(B * P, 14, 14, -1), sel,
                    method=MSRCNN.maskiou_forward)
                iou_sel = jnp.take_along_axis(
                    iou_pred, labf[:, None], axis=-1)[:, 0]
                iou_tgt = maskiou_targets(
                    jax.lax.stop_gradient(sel), tgt,
                    rois_p.reshape(-1, 4),
                    gm.reshape((B * P,) + gm.shape[2:]), mask_stride)
                losses["loss_mask_iou"] = maskiou_loss(
                    iou_sel, jax.lax.stop_gradient(iou_tgt),
                    pos_v.reshape(-1))
            if panoptic:
                # semantic branch (seg_logits ride the model outputs;
                # loss weight 0.5 per panoptic_fpn_r50_fpn_1x_coco.py)
                from ..models.panoptic_fpn import semantic_loss
                losses["loss_seg"] = 0.5 * semantic_loss(
                    out.seg_logits, batch.gt_semantic,
                    num_things=cfg.model.num_classes,
                    num_stuff=model.num_stuff_classes)
            return losses, new_bs

    elif arch == "point_rend":
        from ..models.faster_rcnn import (RCNNLossConfig, RPNLossConfig,
                                          rcnn_forward_train, rpn_loss,
                                          rpn_proposals)
        from ..models.mask_rcnn import mask_loss, mask_targets
        from ..models.point_rend import (COARSE_SIZE, PointRendRCNN,
                                         fine_grained_point_feats,
                                         point_loss, point_targets,
                                         sample_train_points,
                                         simple_roi_align_p2)
        from ..ops.point_sample import point_sample
        rpn_cfg = RPNLossConfig()
        rcnn_cfg = RCNNLossConfig(num_classes=cfg.model.num_classes,
                                  num_samples=cfg.rcnn_num_samples)
        mask_stride = getattr(cfg, "mask_stride", 4)

        def losses_fn(variables, batch, teacher_vars, rng):
            rng1, rng2, rng3 = jax.random.split(rng, 3)
            out = model.apply(variables, batch.images, batch.img_hw)
            losses = rpn_loss(out.rpn, batch.gt_bboxes, batch.gt_valid,
                              batch.img_hw, rng1, rpn_cfg)
            props, _, valid = rpn_proposals(out.rpn, batch.img_hw,
                                            nms_pre=1000,
                                            max_total=cfg.rcnn_num_proposals)
            props = jax.lax.stop_gradient(props)
            rcnn_losses, samples = rcnn_forward_train(
                lambda f: model.apply(variables, f,
                                      method=PointRendRCNN.roi_forward),
                out.neck_feats, props, valid, batch.gt_bboxes,
                batch.gt_labels, batch.gt_valid, rng2, rcnn_cfg)
            losses.update({f"rcnn_{k}": v for k, v in rcnn_losses.items()})

            B = props.shape[0]
            P = max(1, int(rcnn_cfg.num_samples * rcnn_cfg.pos_fraction))
            rois_p = samples.rois[:, :P]
            pos_v = samples.is_pos[:, :P]
            lab_p = samples.labels[:, :P]
            gi_p = samples.gt_idx[:, :P]
            # coarse head input: SimpleRoIAlign(14) on P2 ONLY (the
            # reference's GenericRoIExtractor featmap_strides=[4])
            f14 = jnp.concatenate([
                simple_roi_align_p2(out.neck_feats[0][b], rois_p[b],
                                    pos_v[b]) for b in range(B)])
            coarse = model.apply(variables, f14,
                                 method=PointRendRCNN.coarse_forward)
            gm = jax.vmap(lambda m, i: m[i])(batch.gt_masks, gi_p)
            rois_f = rois_p.reshape(-1, 4)
            gm_f = gm.reshape((B * P,) + gm.shape[2:])
            lab_f = lab_p.reshape(-1)
            tgt7 = mask_targets(rois_f, gm_f, mask_stride,
                                size=COARSE_SIZE)
            losses["loss_mask"] = mask_loss(
                coarse, jax.lax.stop_gradient(tgt7), lab_f,
                pos_v.reshape(-1))
            # point branch: uncertainty-sampled points, BCE at GT class
            rel = sample_train_points(
                rng3, jax.lax.stop_gradient(coarse), lab_f)
            fine = jnp.concatenate([
                fine_grained_point_feats(
                    out.neck_feats[0][b], rois_p[b],
                    rel.reshape(B, P, -1, 2)[b]) for b in range(B)],
                axis=0)
            coarse_pts = point_sample(coarse, rel)
            plogits = model.apply(variables, fine, coarse_pts,
                                  method=PointRendRCNN.point_forward)
            ptgt = point_targets(rois_f, rel, gm_f, mask_stride)
            losses["loss_point"] = point_loss(
                plogits, jax.lax.stop_gradient(ptgt), lab_f,
                pos_v.reshape(-1))
            return losses, None

    elif arch == "tridentnet":
        from ..models.faster_rcnn import (RCNNLossConfig, RPNLossConfig,
                                          rcnn_forward_train, rpn_loss,
                                          rpn_proposals)
        from ..models.trident import TridentFasterRCNN
        rpn_cfg = RPNLossConfig()
        # C4 config: 128 samples, pos_fraction 0.5, no GT-as-proposals
        rcnn_cfg = RCNNLossConfig(num_classes=cfg.model.num_classes,
                                  num_samples=cfg.rcnn_num_samples,
                                  pos_fraction=0.5,
                                  add_gt_as_proposals=False)
        scales = TridentFasterRCNN.anchor_scales()

        def losses_fn(variables, batch, teacher_vars, rng):
            rng1, rng2 = jax.random.split(rng)
            # train: all 3 dilated branches run; each behaves as an extra
            # batch replica (GT tiled alongside)
            out = model.apply(variables, batch.images, batch.img_hw,
                              train_branches=True)
            nb = out.num_branch
            gt_b = jnp.tile(batch.gt_bboxes, (nb, 1, 1))
            gt_l = jnp.tile(batch.gt_labels, (nb, 1))
            gt_v = jnp.tile(batch.gt_valid, (nb, 1))
            hw = jnp.tile(batch.img_hw, (nb, 1))
            losses = rpn_loss(out.rpn, gt_b, gt_v, hw, rng1, rpn_cfg,
                              strides=(16,), scales=scales)
            props, _, valid = rpn_proposals(
                out.rpn, hw, nms_pre=1000,
                max_total=cfg.rcnn_num_proposals,
                strides=(16,), scales=scales)
            props = jax.lax.stop_gradient(props)
            rcnn_losses, _ = rcnn_forward_train(
                lambda f: model.apply(
                    variables, f, method=TridentFasterRCNN.roi_forward),
                (out.c4,), props, valid, gt_b, gt_l, gt_v, rng2, rcnn_cfg,
                strides=(16,), out_size=14)
            losses.update({f"rcnn_{k}": v for k, v in rcnn_losses.items()})
            return losses, None

    elif arch in ("cascade_rcnn", "detectors_cascade_rcnn",
                  "cascade_mask_rcnn"):
        from ..models.cascade_rcnn import (STAGE_WEIGHTS, CascadeRCNN,
                                           cascade_forward_train)
        from ..models.faster_rcnn import (RPNLossConfig, rpn_loss,
                                          rpn_proposals)
        rpn_cfg = RPNLossConfig()
        with_mask = arch == "cascade_mask_rcnn"

        def losses_fn(variables, batch, teacher_vars, rng):
            rng1, rng2 = jax.random.split(rng)
            out = model.apply(variables, batch.images, batch.img_hw)
            losses = rpn_loss(out.rpn, batch.gt_bboxes, batch.gt_valid,
                              batch.img_hw, rng1, rpn_cfg)
            props, _, valid = rpn_proposals(out.rpn, batch.img_hw,
                                            nms_pre=1000,
                                            max_total=cfg.rcnn_num_proposals)
            props = jax.lax.stop_gradient(props)
            res = cascade_forward_train(
                lambda f, st: model.apply(variables, f, st,
                                          method=CascadeRCNN.roi_forward),
                out.neck_feats, props, valid, batch.gt_bboxes,
                batch.gt_labels, batch.gt_valid, rng2,
                num_classes=cfg.model.num_classes,
                num_samples=cfg.rcnn_num_samples,
                collect_samples=with_mask)
            if not with_mask:
                losses.update(res)
                return losses, None
            stage_losses, samples = res
            losses.update(stage_losses)
            # per-stage mask heads on each stage's own positives
            # (cascade_roi_head.py _mask_forward_train, stage weights)
            from ..models.cascade_mask_rcnn import CascadeMaskRCNN
            from ..models.mask_rcnn import mask_loss, mask_targets
            from ..ops.roi_align import multi_level_roi_align
            mask_stride = getattr(cfg, "mask_stride", 4)
            B = props.shape[0]
            P = max(1, cfg.rcnn_num_samples // 4)
            feats_pi = [tuple(f[b] for f in out.neck_feats[:4])
                        for b in range(B)]
            for st, s in enumerate(samples):
                rois_p = s["rois"][:, :P]
                pos_v = s["is_pos"][:, :P]
                lab_p = s["labels"][:, :P]
                gi_p = s["gt_idx"][:, :P]
                f14 = jnp.stack([
                    multi_level_roi_align(feats_pi[b], rois_p[b],
                                          pos_v[b], out_size=14)
                    for b in range(B)])
                logits = model.apply(
                    variables, f14.reshape(B * P, 14, 14, -1), st,
                    method=CascadeMaskRCNN.mask_forward)
                gm = jax.vmap(lambda m, i: m[i])(batch.gt_masks, gi_p)
                tgt = mask_targets(rois_p.reshape(-1, 4),
                                   gm.reshape((B * P,) + gm.shape[2:]),
                                   mask_stride)
                losses[f"s{st}.loss_mask"] = STAGE_WEIGHTS[st] * mask_loss(
                    logits, jax.lax.stop_gradient(tgt),
                    lab_p.reshape(-1), pos_v.reshape(-1))
            return losses, None

    elif arch == "htc":
        from ..models.faster_rcnn import (RPNLossConfig, rpn_loss,
                                          rpn_proposals)
        from ..models.htc import HTC, htc_forward_train, semantic_seg_loss
        rpn_cfg = RPNLossConfig()

        def losses_fn(variables, batch, teacher_vars, rng):
            rng1, rng2 = jax.random.split(rng)
            out = model.apply(variables, batch.images, batch.img_hw)
            losses = rpn_loss(out.rpn, batch.gt_bboxes, batch.gt_valid,
                              batch.img_hw, rng1, rpn_cfg)
            losses["loss_semantic_seg"] = semantic_seg_loss(
                out.sem_pred, batch.gt_semantic)
            props, _, valid = rpn_proposals(out.rpn, batch.img_hw,
                                            nms_pre=1000,
                                            max_total=cfg.rcnn_num_proposals)
            props = jax.lax.stop_gradient(props)
            losses.update(htc_forward_train(
                lambda f, st: model.apply(variables, f, st,
                                          method=HTC.roi_forward),
                lambda f, st: model.apply(variables, f, st,
                                          method=HTC.mask_forward_flow),
                out, props, valid, batch.gt_bboxes, batch.gt_labels,
                batch.gt_valid, batch.gt_masks, rng2,
                num_classes=cfg.model.num_classes,
                num_samples=cfg.rcnn_num_samples))
            return losses, None

    elif arch == "scnet":
        from ..models.faster_rcnn import (RPNLossConfig, rpn_loss,
                                          rpn_proposals)
        from ..models.htc import semantic_seg_loss
        from ..models.scnet import SCNet, glbctx_loss, scnet_forward_train
        rpn_cfg = RPNLossConfig()

        def losses_fn(variables, batch, teacher_vars, rng):
            rng1, rng2 = jax.random.split(rng)
            out = model.apply(variables, batch.images, batch.img_hw)
            losses = rpn_loss(out.rpn, batch.gt_bboxes, batch.gt_valid,
                              batch.img_hw, rng1, rpn_cfg)
            losses["loss_semantic_seg"] = semantic_seg_loss(
                out.sem_pred, batch.gt_semantic)
            losses["loss_glbctx"] = glbctx_loss(
                out.mc_pred, batch.gt_labels, batch.gt_valid)
            props, _, valid = rpn_proposals(out.rpn, batch.img_hw,
                                            nms_pre=1000,
                                            max_total=cfg.rcnn_num_proposals)
            props = jax.lax.stop_gradient(props)
            losses.update(scnet_forward_train(
                lambda f, st: model.apply(variables, f, st,
                                          method=SCNet.roi_forward),
                lambda f, sh: model.apply(variables, f, sh,
                                          method=SCNet.mask_forward),
                out, props, valid, batch.gt_bboxes, batch.gt_labels,
                batch.gt_valid, batch.gt_masks, rng2,
                num_classes=cfg.model.num_classes,
                num_samples=cfg.rcnn_num_samples))
            return losses, None

    elif arch == "maskformer":
        from ..models.maskformer import (MaskFormerLossConfig,
                                         append_stuff_gt, maskformer_loss)
        pan = cfg.model.panoptic
        total = cfg.model.num_classes + (
            cfg.model.num_stuff_classes if pan else 0)
        det_cfg = MaskFormerLossConfig(num_classes=total)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            gl, gm, gv = batch.gt_labels, batch.gt_masks, batch.gt_valid
            if pan:
                gl, gm, gv = append_stuff_gt(
                    gl, gm, gv, batch.gt_semantic,
                    cfg.model.num_classes, cfg.model.num_stuff_classes)
            return maskformer_loss(out, gl, gm, gv, det_cfg), None

    elif arch == "mask2former":
        from ..models.mask2former import (Mask2FormerLossConfig,
                                          mask2former_loss)
        from ..models.maskformer import append_stuff_gt
        pan = cfg.model.panoptic
        total = cfg.model.num_classes + (
            cfg.model.num_stuff_classes if pan else 0)
        det_cfg = Mask2FormerLossConfig(
            num_classes=total,
            num_points=min(12544, 4 * cfg.data.bucket[0] * cfg.data.bucket[1]
                           // 256))

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            gl, gm, gv = batch.gt_labels, batch.gt_masks, batch.gt_valid
            if pan:
                gl, gm, gv = append_stuff_gt(
                    gl, gm, gv, batch.gt_semantic,
                    cfg.model.num_classes, cfg.model.num_stuff_classes)
            return mask2former_loss(out, gl, gm, gv, rng, det_cfg), None

    elif arch == "solo":
        from ..models.solo import solo_loss

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw)
            return solo_loss(
                out, batch.gt_bboxes, batch.gt_labels, batch.gt_valid,
                batch.gt_masks,
                canvas_hw=tuple(batch.images.shape[1:3]),
                num_classes=cfg.model.num_classes), None

    elif arch == "yolact":
        from ..models.yolact import (YOLACTLossConfig, yolact_anchors,
                                     yolact_loss)
        det_cfg = YOLACTLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw)
            sizes = [tuple(c.shape[1:3]) for c in out.head.cls_scores]
            anchors = yolact_anchors(sizes)
            return yolact_loss(
                out, anchors, batch.gt_bboxes, batch.gt_labels,
                batch.gt_valid, batch.gt_masks,
                canvas_hw=tuple(batch.images.shape[1:3]),
                cfg=det_cfg, img_hw=batch.img_hw), None

    elif arch == "centernet":
        from ..models.centernet import CenterNetLossConfig, centernet_loss
        det_cfg = CenterNetLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            return centernet_loss(out, batch.gt_bboxes, batch.gt_labels,
                                  batch.gt_valid, det_cfg), None

    elif arch in ("ssd", "pisa_ssd"):
        from ..models.ssd import (SSDLossConfig, ssd_anchors,
                                  ssd_detection_loss)
        pisa_on = arch == "pisa_ssd"
        ssd_size = cfg.model.ssd_input_size
        det_cfg = SSDLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            if ssd_size == 320:
                # SSDLite trains its MobileNetV2/extras/head BN (scratch
                # recipe, no norm_eval)
                out, mutated = model.apply(
                    variables, batch.images, batch.img_hw,
                    deterministic=True, train=True,
                    mutable=["batch_stats"])
                stats = mutated["batch_stats"]
            else:
                out = model.apply(variables, batch.images, batch.img_hw,
                                  deterministic=True)
                stats = None
            anchors = ssd_anchors([c.shape[1:3] for c in out.cls_scores],
                                  input_size=ssd_size)
            return ssd_detection_loss(out, anchors, batch.gt_bboxes,
                                      batch.gt_labels, batch.gt_valid,
                                      det_cfg, pisa=pisa_on), stats

    elif arch == "yolov3":
        from ..models.yolov3 import YOLOV3LossConfig, yolov3_loss
        det_cfg = YOLOV3LossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            # darknet/mbv2 BN trains (the reference yolov3 recipes carry
            # no norm_eval; stats thread through batch_stats)
            out, mutated = model.apply(
                variables, batch.images, batch.img_hw,
                deterministic=True, train=True, mutable=["batch_stats"])
            return yolov3_loss(out, batch.gt_bboxes, batch.gt_labels,
                               batch.gt_valid,
                               det_cfg), mutated["batch_stats"]

    elif arch == "atss":
        from ..models.atss import (ATSSLossConfig, atss_anchors,
                                   atss_detection_loss)
        det_cfg = ATSSLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            anchors, counts = atss_anchors(
                [c.shape[1:3] for c in out.head.cls_scores])
            return atss_detection_loss(
                out.head, anchors, counts, batch.gt_bboxes,
                batch.gt_labels, batch.gt_valid, det_cfg), None

    elif arch == "vfnet":
        from ..models.vfnet import (VFNetLossConfig, vfnet_loss,
                                    vfnet_points)
        det_cfg = VFNetLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            points, anchors, counts = vfnet_points(
                [c.shape[1:3] for c in out.head.cls_scores])
            return vfnet_loss(out.head, points, anchors, counts,
                              batch.gt_bboxes, batch.gt_labels,
                              batch.gt_valid, det_cfg), None

    elif arch == "tood":
        from ..models.tood import TOODLossConfig, tood_loss, tood_points
        det_cfg = TOODLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            points, anchors, counts = tood_points(
                [c.shape[1:3] for c in out.head.cls_scores])
            return tood_loss(out.head, points, anchors, counts,
                             batch.gt_bboxes, batch.gt_labels,
                             batch.gt_valid, det_cfg, use_tal=True), None

    elif arch == "foveabox":
        from ..models.foveabox import FoveaLossConfig, fovea_loss
        det_cfg = FoveaLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            return fovea_loss(out.head, batch.gt_bboxes, batch.gt_labels,
                              batch.gt_valid, det_cfg), None

    elif arch == "fsaf":
        from ..models.fsaf import FSAFLossConfig, fsaf_loss
        det_cfg = FSAFLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            return fsaf_loss(out.head, batch.gt_bboxes, batch.gt_labels,
                             batch.gt_valid, det_cfg), None

    elif arch == "reppoints":
        from ..models.reppoints import RepPointsLossConfig, reppoints_loss
        det_cfg = RepPointsLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            return reppoints_loss(out.head, out.moment, batch.gt_bboxes,
                                  batch.gt_labels, batch.gt_valid,
                                  det_cfg), None

    elif arch == "free_anchor":
        from ..models.free_anchor import (FreeAnchorLossConfig,
                                          free_anchor_loss)
        from ..models.retinanet import retina_anchors
        det_cfg = FreeAnchorLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            anchors = retina_anchors(
                [c.shape[1:3] for c in out.head.cls_scores])
            return free_anchor_loss(out.head, anchors, batch.gt_bboxes,
                                    batch.gt_labels, batch.gt_valid,
                                    det_cfg), None

    elif arch == "autoassign":
        from ..models.autoassign import (AutoAssignLossConfig,
                                         autoassign_loss)
        det_cfg = AutoAssignLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            return autoassign_loss(
                out.head, out.prior_mean, out.prior_sigma, batch.gt_bboxes,
                batch.gt_labels, batch.gt_valid, det_cfg), None

    elif arch in ("paa", "lad"):
        from ..models.paa import PAALossConfig, paa_anchors, paa_loss
        det_cfg = PAALossConfig(num_classes=cfg.model.num_classes)
        is_lad = arch == "lad"
        t_model = _teacher_model(model, cfg) if is_lad else model

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            anchors, counts = paa_anchors(
                [c.shape[1:3] for c in out.head.cls_scores])
            assign_out = None
            if is_lad:
                assert teacher_vars is not None, \
                    "arch='lad' requires a frozen teacher (lad.py)"
                assign_out = t_model.apply(teacher_vars, batch.images,
                                           batch.img_hw,
                                           deterministic=True).head
            return paa_loss(out.head, anchors, counts, batch.gt_bboxes,
                            batch.gt_labels, batch.gt_valid, det_cfg,
                            assign_out=assign_out), None

    elif arch == "ga_retina":
        from ..models.guided_anchor import (GALossConfig, ga_geometry,
                                            ga_loss)
        det_cfg = GALossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            centers, strides, approxs, counts = ga_geometry(
                [c.shape[1:3] for c in out.head.cls_scores])
            return ga_loss(out.head, centers, strides, approxs, counts,
                           batch.gt_bboxes, batch.gt_labels,
                           batch.gt_valid, det_cfg, rng), None

    elif arch == "sabl_retina":
        from ..models.sabl_retina import (SABLLossConfig, sabl_anchors,
                                          sabl_loss)
        det_cfg = SABLLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            squares, approxs = sabl_anchors(
                [c.shape[1:3] for c in out.head.cls_scores])
            return sabl_loss(out.head, squares, approxs, batch.gt_bboxes,
                             batch.gt_labels, batch.gt_valid,
                             det_cfg), None

    elif arch == "grid_rcnn":
        from ..core.max_iou_assigner import max_iou_assign, random_sample
        from ..models.faster_rcnn import (RPNLossConfig, rpn_loss,
                                          rpn_proposals)
        from ..models.grid_rcnn import (GridRCNN, extend_rois,
                                        grid_head_loss)
        from ..ops.roi_align import multi_level_roi_align
        rpn_cfg = RPNLossConfig()
        NCgr = cfg.model.num_classes

        def losses_fn(variables, batch, teacher_vars, rng):
            from ..core import losses as CL
            rng1, rng2 = jax.random.split(rng)
            out = model.apply(variables, batch.images, batch.img_hw)
            losses = rpn_loss(out.rpn, batch.gt_bboxes, batch.gt_valid,
                              batch.img_hw, rng1, rpn_cfg)
            props, _, pvalid = rpn_proposals(
                out.rpn, batch.img_hw, nms_pre=1000,
                max_total=cfg.rcnn_num_proposals)
            props = jax.lax.stop_gradient(props)
            B = props.shape[0]
            G = batch.gt_bboxes.shape[1]
            S = cfg.rcnn_num_samples

            def per_image(r, rois, rv, gtb, gtl, gtv, feats):
                rois_all = jnp.concatenate([rois, gtb], 0)
                rv_all = jnp.concatenate([rv, gtv], 0)
                assign = max_iou_assign(rois_all, gtb, gtl, gtv, NCgr,
                                        0.5, 0.5, 0.5,
                                        match_low_quality=False)
                a = jnp.where(rv_all, assign.assigned_gt, -2)
                sample = random_sample(r, a, S, 0.25)
                idx = jnp.concatenate([sample.pos_idx, sample.neg_idx])
                is_pos = jnp.concatenate(
                    [sample.pos_valid, jnp.zeros_like(sample.neg_valid)])
                valid = jnp.concatenate([sample.pos_valid,
                                         sample.neg_valid])
                srois = rois_all[idx]
                safe = jnp.clip(a[idx], 0, G - 1)
                labels = jnp.where(is_pos, gtl[safe].astype(jnp.int32),
                                   NCgr)
                f7 = multi_level_roi_align(feats, srois, valid)
                # grid stage: POSITIVES only, extended 2x
                prois = rois_all[sample.pos_idx]
                erois = extend_rois(prois)
                f14 = multi_level_roi_align(feats, erois,
                                            sample.pos_valid,
                                            out_size=14)
                ptgt = gtb[jnp.clip(a[sample.pos_idx], 0, G - 1)]
                return (f7, labels, valid, f14, erois, ptgt,
                        sample.pos_valid)

            feats_pi = [tuple(f[b] for f in out.neck_feats[:4])
                        for b in range(B)]
            parts = [per_image(jax.random.fold_in(rng2, b), props[b],
                               pvalid[b], batch.gt_bboxes[b],
                               batch.gt_labels[b], batch.gt_valid[b],
                               feats_pi[b]) for b in range(B)]
            f7 = jnp.concatenate([p[0] for p in parts])
            labels = jnp.concatenate([p[1] for p in parts])
            valid = jnp.concatenate([p[2] for p in parts])
            cls_logits, _ = model.apply(variables, f7,
                                        method=GridRCNN.roi_forward)
            nt = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
            losses["rcnn_loss_cls"] = CL.cross_entropy_loss(
                cls_logits, labels, weight=valid.astype(jnp.float32),
                avg_factor=nt)
            f14 = jnp.concatenate([p[3] for p in parts])
            erois = jnp.concatenate([p[4] for p in parts])
            ptgt = jnp.concatenate([p[5] for p in parts])
            pvalid_all = jnp.concatenate([p[6] for p in parts])
            grid_pred = model.apply(variables, f14,
                                    method=GridRCNN.grid_forward)
            losses["loss_grid"] = grid_head_loss(grid_pred, erois, ptgt,
                                                 pvalid_all)
            return losses, None

    elif arch == "sparse_rcnn":
        from ..models.sparse_rcnn import (SparseRCNNLossConfig,
                                          sparse_rcnn_loss)
        det_cfg = SparseRCNNLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            return sparse_rcnn_loss(out, batch.gt_bboxes,
                                    batch.gt_labels, batch.gt_valid,
                                    batch.img_hw, det_cfg), None

    elif arch == "queryinst":
        from ..models.queryinst import queryinst_loss
        from ..models.sparse_rcnn import SparseRCNNLossConfig
        det_cfg = SparseRCNNLossConfig(num_classes=cfg.model.num_classes)
        mask_stride = getattr(cfg, "mask_stride", 4)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            return queryinst_loss(
                model, variables, out, batch.gt_bboxes, batch.gt_labels,
                batch.gt_valid, batch.gt_masks, batch.img_hw, det_cfg,
                mask_stride=mask_stride), None

    elif arch == "centripetalnet":
        from ..models.centripetal import (CentripetalLossConfig,
                                          centripetalnet_loss)
        det_cfg = CentripetalLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out, mutated = model.apply(
                variables, batch.images, batch.img_hw, deterministic=False,
                mutable=["batch_stats"])
            return centripetalnet_loss(
                out.head, batch.gt_bboxes, batch.gt_labels,
                batch.gt_valid, det_cfg), mutated["batch_stats"]

    elif arch == "cornernet":
        from ..models.cornernet import CornerLossConfig, cornernet_loss
        det_cfg = CornerLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            # hourglass BN trains (reference cornernet: no norm_eval)
            out, mutated = model.apply(
                variables, batch.images, batch.img_hw, deterministic=False,
                mutable=["batch_stats"])
            return cornernet_loss(out.head, batch.gt_bboxes,
                                  batch.gt_labels, batch.gt_valid,
                                  det_cfg), mutated["batch_stats"]

    elif arch == "fast_rcnn":
        from ..models.faster_rcnn import (FasterRCNN, RCNNLossConfig,
                                          rcnn_forward_train)
        rcnn_cfg = RCNNLossConfig(num_classes=cfg.model.num_classes,
                                  num_samples=cfg.rcnn_num_samples)

        def losses_fn(variables, batch, teacher_vars, rng):
            # Fast R-CNN consumes EXTERNAL proposals (the reference's
            # precomputed .pkl files). Absent proposal files in this
            # environment, jittered GT boxes stand in for the
            # high-recall proposal distribution (documented).
            rng1, rng2 = jax.random.split(rng)
            G = batch.gt_bboxes.shape[1]
            reps = max(1, cfg.rcnn_num_proposals // max(G, 1))
            base = jnp.tile(batch.gt_bboxes, (1, reps, 1))
            noise = jax.random.normal(rng1, base.shape) * 8.0
            props = base + noise
            valid = jnp.tile(batch.gt_valid, (1, reps))
            out = model.apply(variables, batch.images, batch.img_hw)
            losses, _ = rcnn_forward_train(
                lambda f: model.apply(variables, f,
                                      method=FasterRCNN.roi_forward),
                out.neck_feats, props, valid, batch.gt_bboxes,
                batch.gt_labels, batch.gt_valid, rng2, rcnn_cfg)
            return losses, None

    else:
        raise ValueError(f"no train step for arch: {arch}")

    return _jit_family_step(losses_fn)


def _jit_family_step(losses_fn):
    """Common tail: wrap a family losses_fn into the jitted, donating
    (state, batch, teacher_vars) -> (state, losses) train step."""

    def train_step(state: TrainState, batch: Batch, teacher_vars=None):
        rng, step_rng = jax.random.split(state.rng)

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats}
            losses, new_bs = losses_fn(variables, batch, teacher_vars,
                                       step_rng)
            return parse_losses(losses), (losses, new_bs)

        (total, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads).replace(rng=rng)
        if new_bs is not None:
            new_state = new_state.replace(batch_stats=new_bs)
        losses = dict(losses)
        losses["loss"] = total
        return new_state, losses

    return jax.jit(train_step, donate_argnums=(0,))

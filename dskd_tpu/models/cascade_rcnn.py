"""Cascade R-CNN (parity: mmdet roi_heads/cascade_roi_head.py +
configs/_base_/models/cascade_rcnn_r50_fpn.py).

Three sequential class-AGNOSTIC bbox heads at increasing assignment IoUs
(0.5 / 0.6 / 0.7) with per-stage delta target stds (0.1 / 0.05 / 0.033
ladders) and stage loss weights (1 / 0.5 / 0.25); each stage refines the
previous stage's decoded boxes. Test time averages the per-stage class
scores on the final boxes (cascade_roi_head.simple_test ensembling).
Reuses the Faster R-CNN RPN / RoIAlign / sampling machinery.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.anchors import bbox2delta, delta2bbox
from ..core.max_iou_assigner import max_iou_assign, random_sample
from ..core.postprocess import batched_nms, filter_scores_and_topk
from ..ops.roi_align import multi_level_roi_align
from .faster_rcnn import RPNHead, RPNOutputs
from .fpn import FPN
from .resnet import ResNet

STAGE_IOUS = (0.5, 0.6, 0.7)
STAGE_STDS = ((0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
              (0.033, 0.033, 0.067, 0.067))
STAGE_WEIGHTS = (1.0, 0.5, 0.25)


class CascadeOutputs(NamedTuple):
    rpn: RPNOutputs
    neck_feats: Tuple[jnp.ndarray, ...]


class CascadeBBoxHead(nn.Module):
    """Shared2FC head with CLASS-AGNOSTIC regression (cascade default)."""
    num_classes: int = 80
    fc_channels: int = 1024

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_channels, name="shared_fc0")(x))
        x = nn.relu(nn.Dense(self.fc_channels, name="shared_fc1")(x))
        cls = nn.Dense(self.num_classes + 1,
                       kernel_init=nn.initializers.normal(0.01),
                       name="fc_cls")(x)
        reg = nn.Dense(4, kernel_init=nn.initializers.normal(0.001),
                       name="fc_reg")(x)
        return cls, reg


class CascadeRCNN(nn.Module):
    """``rfp``/``sac`` select the DetectoRS variants
    (configs/detectors: cascade_rcnn_r50_{rfp,sac}_1x and the full
    detectors_cascade_rcnn_r50_1x = both, box AP 44.8/45.0/47.4):
    sac swaps the backbone for DetectoRSResNet (switchable atrous
    convs, stages 2-4); rfp replaces backbone+neck with the recursive
    feature pyramid (two backbone passes, shared FPN, ASPP feedback,
    sigmoid fusion) — models/detectors_rs.py."""
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = 1
    num_stages: int = 3
    rfp: bool = False
    sac: bool = False

    def setup(self):
        if self.rfp:
            from .detectors_rs import RFP
            self.rfp_pyramid = RFP(
                out_channels=256, num_outs=5, depth=self.depth,
                frozen_stages=self.frozen_stages,
                sac_stages=((False, True, True, True) if self.sac
                            else (False, False, False, False)))
        elif self.sac:
            from .detectors_rs import DetectoRSResNet
            self.backbone = DetectoRSResNet(
                depth=self.depth, frozen_stages=self.frozen_stages)
            self.neck = FPN(out_channels=256, num_outs=5, start_level=0,
                            add_extra_convs="")
        else:
            self.backbone = ResNet(depth=self.depth,
                                   out_indices=(0, 1, 2, 3),
                                   frozen_stages=self.frozen_stages)
            self.neck = FPN(out_channels=256, num_outs=5, start_level=0,
                            add_extra_convs="")
        self.rpn_head = RPNHead()
        self.bbox_heads = [CascadeBBoxHead(num_classes=self.num_classes,
                                           name=f"bbox_head{i}")
                           for i in range(self.num_stages)]

    def __call__(self, images, img_hw, deterministic: bool = True):
        if self.rfp:
            neck = self.rfp_pyramid(images)
        else:
            neck = self.neck(self.backbone(images))
        return CascadeOutputs(self.rpn_head(neck), neck)

    def roi_forward(self, roi_feats, stage: int):
        return self.bbox_heads[stage](roi_feats)

    def init_all(self, images, img_hw, deterministic: bool = True):
        out = self(images, img_hw, deterministic)
        for i in range(self.num_stages):
            self.bbox_heads[i](jnp.zeros((1, 7, 7, 256), images.dtype))
        return out


def _stage_sample_and_targets(rng, rois, rois_valid, gt_bboxes, gt_labels,
                              gt_valid, num_classes, iou_thr, num_samples,
                              pos_fraction):
    """MaxIoU assign at ``iou_thr`` + random sampling, one image."""
    G = gt_bboxes.shape[0]
    assign = max_iou_assign(rois, gt_bboxes, gt_labels, gt_valid,
                            num_classes, pos_iou_thr=iou_thr,
                            neg_iou_thr=iou_thr, min_pos_iou=iou_thr,
                            match_low_quality=False)
    a = jnp.where(rois_valid, assign.assigned_gt, -2)
    sample = random_sample(rng, a, num_samples, pos_fraction)
    idx = jnp.concatenate([sample.pos_idx, sample.neg_idx])
    valid = jnp.concatenate([sample.pos_valid, sample.neg_valid])
    is_pos = jnp.concatenate([sample.pos_valid,
                              jnp.zeros_like(sample.neg_valid)])
    safe = jnp.clip(a[idx], 0, G - 1)
    labels = jnp.where(is_pos, gt_labels[safe].astype(jnp.int32),
                       num_classes)
    return idx, valid, is_pos, labels, gt_bboxes[safe], safe


def cascade_forward_train(model_apply_roi, neck_feats, proposals,
                          proposal_valid, gt_bboxes, gt_labels, gt_valid,
                          rng, num_classes: int, num_samples: int = 512,
                          pos_fraction: float = 0.25,
                          collect_samples: bool = False):
    """All cascade stages: sample -> RoIAlign -> head -> loss; refine
    boxes between stages with that stage's agnostic deltas.

    ``collect_samples``: also return, per stage, the sampled rois /
    validity / positivity / labels / matched-GT index (positives-first
    layout from ``random_sample``) so a mask branch can train on each
    stage's own sampling results (cascade_roi_head.py mask path)."""
    B = proposals.shape[0]
    losses = {}
    stage_samples = []
    rois = jnp.concatenate([proposals, gt_bboxes], axis=1)
    rois_valid = jnp.concatenate([proposal_valid, gt_valid], axis=1)

    for stage, (iou, stds, wgt) in enumerate(
            zip(STAGE_IOUS, STAGE_STDS, STAGE_WEIGHTS)):
        rngs = jax.random.split(jax.random.fold_in(rng, stage), B)
        idx, valid, is_pos, labels, tgt_boxes, gt_idx = jax.vmap(
            lambda r, ro, rv, b, l, v: _stage_sample_and_targets(
                r, ro, rv, b, l, v, num_classes, iou, num_samples,
                pos_fraction))(rngs, rois, rois_valid, gt_bboxes,
                               gt_labels, gt_valid)
        sampled = jnp.take_along_axis(rois, idx[..., None], axis=1)
        if collect_samples:
            stage_samples.append(dict(rois=sampled, valid=valid,
                                      is_pos=is_pos, labels=labels,
                                      gt_idx=gt_idx))

        feats_per_img = [tuple(f[b] for f in neck_feats[:4])
                         for b in range(B)]
        roi_feats = jnp.stack([
            multi_level_roi_align(feats_per_img[b], sampled[b], valid[b])
            for b in range(B)])
        S = sampled.shape[1]
        cls_logits, reg = model_apply_roi(
            roi_feats.reshape(B * S, 7, 7, -1), stage)

        valid_f = valid.reshape(-1).astype(jnp.float32)
        is_pos_f = is_pos.reshape(-1).astype(jnp.float32)
        num_total = jnp.maximum(valid_f.sum(), 1.0)
        losses[f"s{stage}.loss_cls"] = wgt * L.cross_entropy_loss(
            cls_logits, labels.reshape(-1), weight=valid_f,
            avg_factor=num_total)
        deltas_tgt = bbox2delta(sampled.reshape(-1, 4),
                                tgt_boxes.reshape(-1, 4), stds=stds)
        losses[f"s{stage}.loss_bbox"] = wgt * L.smooth_l1_loss(
            reg, deltas_tgt, beta=1.0, weight=is_pos_f[:, None],
            avg_factor=num_total)

        # refine: next stage's rois are this stage's decoded boxes
        refined = delta2bbox(sampled.reshape(-1, 4), reg, stds=stds)
        rois = jax.lax.stop_gradient(refined.reshape(B, S, 4))
        rois_valid = valid
    if collect_samples:
        return losses, stage_samples
    return losses


def cascade_get_bboxes(model_apply_roi, neck_feats, proposals,
                       proposal_valid, img_hw, num_classes: int,
                       scale_factor=None, score_thr: float = 0.05,
                       nms_iou: float = 0.5, max_per_img: int = 100,
                       rescale: bool = False):
    """Stage-wise refinement; final boxes scored by the AVERAGE softmax
    over all stage heads (the reference's ms_scores ensemble)."""
    B, S = proposals.shape[:2]
    rois = proposals
    stage_scores = []
    for stage, stds in enumerate(STAGE_STDS):
        feats_per_img = [tuple(f[b] for f in neck_feats[:4])
                         for b in range(B)]
        roi_feats = jnp.stack([
            multi_level_roi_align(feats_per_img[b], rois[b],
                                  proposal_valid[b]) for b in range(B)])
        cls_logits, reg = model_apply_roi(
            roi_feats.reshape(B * S, 7, 7, -1), stage)
        stage_scores.append(jax.nn.softmax(cls_logits, -1))
        refined = delta2bbox(rois.reshape(-1, 4), reg, stds=stds)
        h = img_hw[:, 0:1].astype(refined.dtype)
        w = img_hw[:, 1:2].astype(refined.dtype)
        refined = refined.reshape(B, S, 4)
        refined = jnp.stack([
            jnp.clip(refined[..., 0], 0, w), jnp.clip(refined[..., 1], 0, h),
            jnp.clip(refined[..., 2], 0, w), jnp.clip(refined[..., 3], 0, h)],
            -1)
        if stage < len(STAGE_STDS) - 1:
            rois = refined
    probs = (sum(stage_scores) / len(stage_scores))[:, :num_classes]
    probs = probs.reshape(B, S, num_classes)

    def per_image(boxes, rv, p, sf):
        # multiclass_nms semantics: every (box, class) pair above score_thr
        # is a detection candidate — a box whose 2nd-best class is a true
        # positive must survive (round-2 review fix; bbox_head.get_bboxes ->
        # multiclass_nms over the full (S, C) ensemble score matrix)
        p = jnp.where(rv[:, None], p, 0.0)
        top = filter_scores_and_topk(p, score_thr, min(1000, S * num_classes))
        nb, ns, nl, keep, _ = batched_nms(
            boxes[top.keep_idxs], top.scores, top.labels, nms_iou,
            max_per_img, valid=top.valid)
        if rescale and sf is not None:
            nb = nb / sf[None]
        return nb, ns, nl, keep

    if scale_factor is None:
        scale_factor = jnp.ones((B, 4), jnp.float32)
    nb, ns, nl, keep = jax.vmap(per_image)(refined, proposal_valid, probs,
                                           scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=keep)


# --- family registrations (dskd_tpu/registry.py) ------------------------
# cascade_rcnn + detectors_cascade_rcnn (RFP/SAC recipe) register here;
# cascade_mask_rcnn (models/cascade_mask_rcnn.py) reuses
# cascade_family_losses with the per-stage mask tail.

def cascade_family_losses(model, cfg, *, with_mask=False):
    from ..models.faster_rcnn import RPNLossConfig, rpn_loss, rpn_proposals
    rpn_cfg = RPNLossConfig()

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
    return losses_fn


def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return CascadeRCNN(num_classes=m.num_classes, depth=m.depth,
                           frozen_stages=m.frozen_stages,
                           rfp=m.rfp, sac=m.sac)

    def losses(model, cfg, **_):
        return cascade_family_losses(model, cfg, with_mask=False)

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..models.faster_rcnn import rpn_proposals
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
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
        return step

    for name in ("cascade_rcnn", "detectors_cascade_rcnn"):
        register_family(name, build=build, losses=losses,
                        eval_step=eval_step, init_all=True)


_register()

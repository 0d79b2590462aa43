"""Hybrid Task Cascade (parity: mmdet detectors/htc.py +
roi_heads/htc_roi_head.py + mask_heads/htc_mask_head.py +
mask_heads/fused_semantic_head.py; configs/htc/htc_r50_fpn_1x_coco.py,
box AP 42.3 / mask AP 37.4).

HTC = Cascade Mask R-CNN plus three couplings (the paper's ablation
order), all implemented here:
  * semantic branch: a FusedSemanticHead over the 5 FPN levels at the
    stride-8 fusion level (CE loss, weight 0.2, ignore 255); its
    embedding feature is RoI-pooled and ADDED to both the bbox (7x7) and
    mask (14x14) RoI features (semantic_fusion=('bbox', 'mask')).
  * interleaved execution (htc_roi_head.py:294-311): each stage's mask
    branch trains on RoIs RE-ASSIGNED AND RE-SAMPLED from that stage's
    regressed boxes, not the pre-regression proposals.
  * mask information flow (htc_roi_head.py:138-148): stage i's mask head
    receives the stage-(i-1) head feature chain - every previous head
    runs feature-only on the CURRENT stage's RoI features, each fused in
    through a per-head 1x1 conv_res.

Test time follows htc_roi_head.simple_test: cascade score ensembling for
boxes (with bbox semantic fusion), then the 3 mask heads run as a
feature chain on the final boxes and their sigmoid probabilities are
averaged.

TPU-native re-design notes: padded static RoI counts with validity
masks replace the per-image dynamic sampling lists; the per-stage
re-assignment runs under vmap over the batch (one fused program, no
python per-image loop); the semantic head's bilinear level resizes use
XLA's align_corners=False bilinear (the reference uses
align_corners=True - sub-pixel difference, documented deviation).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.anchors import bbox2delta, delta2bbox
from ..core.postprocess import batched_nms, filter_scores_and_topk
from ..ops.roi_align import multi_level_roi_align, roi_align
from .cascade_rcnn import (STAGE_IOUS, STAGE_STDS, STAGE_WEIGHTS,
                           CascadeRCNN, _stage_sample_and_targets)
from .mask_rcnn import MASK_SIZE


class HTCMaskHead(nn.Module):
    """htc_mask_head.py: FCN mask head + a 1x1 conv_res fusing the
    previous head's feature (mask information flow)."""
    num_classes: int = 80
    num_convs: int = 4
    channels: int = 256

    @nn.compact
    def __call__(self, x, res_feat=None, return_logits: bool = True):
        if res_feat is not None:
            x = x + nn.relu(nn.Conv(self.channels, (1, 1),
                                    name="conv_res")(res_feat))
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.channels, (3, 3),
                                padding=[(1, 1), (1, 1)],
                                name=f"conv{i}")(x))
        feat = x
        if not return_logits:
            return None, feat
        x = nn.relu(nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                                     name="upsample")(x))
        return nn.Conv(self.num_classes, (1, 1), name="logits")(x), feat


class FusedSemanticHead(nn.Module):
    """fused_semantic_head.py: per-level 1x1 laterals summed at the
    fusion level, 4 3x3 convs, then 1x1 logits + 1x1 embedding.

    ``conv_to_res``: SCNet's variant (scnet_semantic_head.py +
    configs/scnet conv_to_res=True) replaces the 4 convs with 2
    SimplifiedBasicBlocks."""
    num_classes: int = 183
    channels: int = 256
    fusion_level: int = 1
    num_convs: int = 4
    conv_to_res: bool = False

    @nn.compact
    def __call__(self, feats):
        fh, fw = feats[self.fusion_level].shape[1:3]
        x = nn.Conv(self.channels, (1, 1), name=f"lateral{self.fusion_level}")(
            feats[self.fusion_level])
        x = nn.relu(x)
        for i, f in enumerate(feats):
            if i == self.fusion_level:
                continue
            # reference order (fused_semantic_head.py:98-104): interpolate
            # the RAW level first, lateral conv+ReLU after — the ordering
            # matters through the ReLU.
            f = jax.image.resize(f, (f.shape[0], fh, fw, f.shape[3]),
                                 method="bilinear")
            x = x + nn.relu(nn.Conv(self.channels, (1, 1),
                                    name=f"lateral{i}")(f))
        if self.conv_to_res:
            from .scnet import SimplifiedBasicBlock
            for i in range(self.num_convs // 2):
                x = SimplifiedBasicBlock(self.channels,
                                         name=f"res{i}")(x)
        else:
            for i in range(self.num_convs):
                x = nn.relu(nn.Conv(self.channels, (3, 3),
                                    padding=[(1, 1), (1, 1)],
                                    name=f"conv{i}")(x))
        pred = nn.Conv(self.num_classes, (1, 1), name="logits")(x)
        feat = nn.relu(nn.Conv(self.channels, (1, 1), name="embedding")(x))
        return pred, feat


class HTCOutputs(NamedTuple):
    rpn: object
    neck_feats: Tuple[jnp.ndarray, ...]
    sem_pred: jnp.ndarray     # (B, H/8, W/8, semantic_classes)
    sem_feat: jnp.ndarray     # (B, H/8, W/8, 256)


class HTC(CascadeRCNN):
    semantic_classes: int = 183

    def setup(self):
        super().setup()
        self.mask_heads = [HTCMaskHead(num_classes=self.num_classes,
                                       name=f"mask_head{i}")
                           for i in range(self.num_stages)]
        self.semantic_head = FusedSemanticHead(
            num_classes=self.semantic_classes, name="semantic_head")

    def __call__(self, images, img_hw, deterministic: bool = True):
        # rfp/sac ride the inherited CascadeRCNN fields (configs/detectors
        # detectors_htc_r50_1x = HTC + RFP + SAC, box AP 49.1)
        if self.rfp:
            neck = self.rfp_pyramid(images)
        else:
            neck = self.neck(self.backbone(images))
        sem_pred, sem_feat = self.semantic_head(neck)
        return HTCOutputs(self.rpn_head(neck), neck, sem_pred, sem_feat)

    def mask_forward_flow(self, f14, stage: int):
        """Stage ``stage`` mask logits with information flow: heads
        0..stage-1 run feature-only on the SAME RoI features
        (htc_roi_head.py:141-146)."""
        last = None
        for i in range(stage):
            _, last = self.mask_heads[i](f14, last, return_logits=False)
        logits, _ = self.mask_heads[stage](f14, last)
        return logits

    def mask_forward_test(self, f14):
        """All stages chained (simple_test), mean sigmoid over stages."""
        last = None
        probs = 0.0
        for i in range(self.num_stages):
            logits, last = self.mask_heads[i](f14, last)
            probs = probs + jax.nn.sigmoid(logits)
        return probs / self.num_stages

    def init_all(self, images, img_hw, deterministic: bool = True):
        out = self(images, img_hw, deterministic)
        z7 = jnp.zeros((1, 7, 7, 256), images.dtype)
        z14 = jnp.zeros((1, 14, 14, 256), images.dtype)
        for i in range(self.num_stages):
            self.bbox_heads[i](z7)
            self.mask_heads[i](z14, None if i == 0 else z14)
        return out


def semantic_seg_loss(sem_pred, gt_semantic, ignore_index: int = 255,
                      loss_weight: float = 0.2):
    """FusedSemanticHead.loss: per-pixel CE, ignore 255, weight 0.2.
    gt_semantic arrives at mask_stride (4); the head predicts at the
    stride-8 fusion level, so the target is 2x-subsampled (the
    reference's SegRescale(1/8) pipeline step)."""
    C = sem_pred.shape[-1]
    H8, W8 = sem_pred.shape[1:3]
    tgt = gt_semantic[:, : 2 * H8: 2, : 2 * W8: 2].astype(jnp.int32)
    th, tw = tgt.shape[1:3]
    pred = sem_pred[:, :th, :tw]
    valid = (tgt != ignore_index) & (tgt >= 0) & (tgt < C)
    safe = jnp.clip(tgt, 0, C - 1)
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), -1)
    ce = -jnp.take_along_axis(logp, safe[..., None], -1)[..., 0]
    n = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
    return loss_weight * (ce * valid).sum() / n


def _sem_roi(sem_feat_b, rois_b, valid_b, out_size: int):
    """Semantic RoI fusion term: pool the stride-8 embedding at the RoIs.

    The reference extractor always pools 14x14 (htc config
    semantic_roi_extractor output_size=14) and adaptive-avg-pools down
    for the 7x7 bbox branch (htc_roi_head.py:165-170); 14->7 adaptive
    pooling is an exact 2x2 mean, reproduced here."""
    o = roi_align(sem_feat_b, rois_b, 14, spatial_scale=1.0 / 8)
    if out_size != 14:
        assert 14 % out_size == 0, out_size
        k = 14 // out_size
        o = o.reshape(o.shape[0], out_size, k, out_size, k,
                      o.shape[-1]).mean((2, 4))
    return o * valid_b[:, None, None, None]


def htc_forward_train(apply_roi, apply_mask_flow, out: HTCOutputs,
                      proposals, proposal_valid, gt_bboxes, gt_labels,
                      gt_valid, gt_masks, rng, num_classes: int,
                      num_samples: int = 512, pos_fraction: float = 0.25,
                      mask_stride: int = 4):
    """Interleaved cascade train loop (htc_roi_head.forward_train).

    Per stage: sample on current RoIs -> bbox head (semantic-fused) ->
    refine -> RE-sample on refined RoIs -> mask head (semantic-fused,
    info flow) on the re-sampled positives."""
    from .mask_rcnn import mask_loss, mask_targets
    B = proposals.shape[0]
    losses = {}
    rois = jnp.concatenate([proposals, gt_bboxes], axis=1)
    rois_valid = jnp.concatenate([proposal_valid, gt_valid], axis=1)
    feats_pi = [tuple(f[b] for f in out.neck_feats[:4]) for b in range(B)]
    P = max(1, num_samples // 4)    # positives cap for the mask branch

    def sample(rng_s, rois_, rvalid_, iou):
        rngs = jax.random.split(rng_s, B)
        return jax.vmap(
            lambda r, ro, rv, b, l, v: _stage_sample_and_targets(
                r, ro, rv, b, l, v, num_classes, iou, num_samples,
                pos_fraction))(rngs, rois_, rvalid_, gt_bboxes,
                               gt_labels, gt_valid)

    def roi_feats(rois_s, valid_s, out_size):
        f = jnp.stack([
            multi_level_roi_align(feats_pi[b], rois_s[b], valid_s[b],
                                  out_size=out_size) for b in range(B)])
        sem = jnp.stack([
            _sem_roi(out.sem_feat[b], rois_s[b], valid_s[b], out_size)
            for b in range(B)])
        return f + sem

    for stage, (iou, stds, wgt) in enumerate(
            zip(STAGE_IOUS, STAGE_STDS, STAGE_WEIGHTS)):
        rng_b, rng_m = jax.random.split(jax.random.fold_in(rng, stage))
        idx, valid, is_pos, labels, tgt_boxes, _ = sample(
            rng_b, rois, rois_valid, iou)
        sampled = jnp.take_along_axis(rois, idx[..., None], axis=1)
        S = sampled.shape[1]
        f7 = roi_feats(sampled, valid, 7)
        cls_logits, reg = apply_roi(f7.reshape(B * S, 7, 7, -1), stage)

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

        # refine, then interleaved re-assignment for the mask branch
        refined = delta2bbox(sampled.reshape(-1, 4), reg, stds=stds)
        rois = jax.lax.stop_gradient(refined.reshape(B, S, 4))
        rois_valid = valid
        m_idx, m_valid, m_pos, m_labels, _, m_gt = sample(
            rng_m, rois, rois_valid, iou)
        m_rois = jnp.take_along_axis(rois, m_idx[..., None], axis=1)
        rois_p, pos_v = m_rois[:, :P], m_pos[:, :P]
        lab_p, gi_p = m_labels[:, :P], m_gt[:, :P]
        f14 = roi_feats(rois_p, pos_v, 14)
        logits = apply_mask_flow(f14.reshape(B * P, 14, 14, -1), stage)
        gm = jax.vmap(lambda m, i: m[i])(gt_masks, gi_p)
        tgt = mask_targets(rois_p.reshape(-1, 4),
                           gm.reshape((B * P,) + gm.shape[2:]), mask_stride)
        losses[f"s{stage}.loss_mask"] = wgt * mask_loss(
            logits, jax.lax.stop_gradient(tgt), lab_p.reshape(-1),
            pos_v.reshape(-1))
    return losses


def htc_get_bboxes(apply_roi, out: HTCOutputs, proposals, proposal_valid,
                   img_hw, num_classes: int, scale_factor=None,
                   score_thr: float = 0.05, nms_iou: float = 0.5,
                   max_per_img: int = 100, rescale: bool = False):
    """Cascade ensemble decode with bbox semantic fusion
    (htc_roi_head.simple_test)."""
    B, S = proposals.shape[:2]
    feats_pi = [tuple(f[b] for f in out.neck_feats[:4]) for b in range(B)]
    rois = proposals
    stage_scores = []
    for stage, stds in enumerate(STAGE_STDS):
        f7 = jnp.stack([
            multi_level_roi_align(feats_pi[b], rois[b], proposal_valid[b])
            + _sem_roi(out.sem_feat[b], rois[b], proposal_valid[b], 7)
            for b in range(B)])
        cls_logits, reg = apply_roi(f7.reshape(B * S, 7, 7, -1), stage)
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
        p = jnp.where(rv[:, None], p, 0.0)
        top = filter_scores_and_topk(p, score_thr,
                                     min(1000, S * num_classes))
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


def htc_mask_probs(model, variables, out: HTCOutputs, det_boxes,
                   det_valid):
    """(B, R, 28, 28, C) chained-stage mean sigmoid probs on the final
    boxes, with mask semantic fusion."""
    B, R = det_boxes.shape[:2]
    feats_pi = [tuple(f[b] for f in out.neck_feats[:4]) for b in range(B)]
    f14 = jnp.stack([
        multi_level_roi_align(feats_pi[b], det_boxes[b], det_valid[b],
                              out_size=14)
        + _sem_roi(out.sem_feat[b], det_boxes[b], det_valid[b], 14)
        for b in range(B)])
    probs = model.apply(variables, f14.reshape(B * R, 14, 14, -1),
                        method=HTC.mask_forward_test)
    return probs.reshape(B, R, MASK_SIZE, MASK_SIZE, -1)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return HTC(num_classes=m.num_classes, depth=m.depth,
                   frozen_stages=m.frozen_stages,
                   rfp=m.rfp, sac=m.sac)

    def losses(model, cfg, **_):
        from ..models.faster_rcnn import (RPNLossConfig, rpn_loss,
                                          rpn_proposals)
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
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..models.faster_rcnn import rpn_proposals
        from ..utils.det import DetM

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
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
        return step

    register_family("htc", build=build, losses=losses,
                    eval_step=eval_step, init_all=True, with_mask=True,
                    with_semantic=True)


_register()

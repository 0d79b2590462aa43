"""SCNet (parity: mmdet detectors/scnet.py + roi_heads/scnet_roi_head.py
+ bbox_heads/scnet_bbox_head.py + mask_heads/{scnet_mask_head,
feature_relay_head, global_context_head, scnet_semantic_head}.py;
configs/scnet/scnet_r50_fpn_1x_coco.py, box AP 43.5 / mask AP 39.2).

"Sample Consistency Network": a cascade R-CNN whose mask branch runs
ONCE (not per stage) and is made consistent with the box branch via
three couplings:
  * semantic branch (HTC's FusedSemanticHead, conv_to_res variant; CE
    weight 0.2, ignore 255), RoI-fused into bbox and mask features;
  * global context head: SimplifiedBasicBlocks on the LAST FPN level ->
    global average pool -> per-class multi-label BCE (weight 3.0); the
    pooled (1, 1, 256) context vector is ADDED to every RoI feature of
    its image (scnet_roi_head.py _fuse_glbctx);
  * feature relay: the LAST bbox stage's shared-fc feature of each
    sampled RoI is mapped fc -> (7, 7, 256) -> x2 bilinear upsample and
    ADDED to that RoI's 14x14 mask features
    (feature_relay_head.py).
The mask head replaces the FCN convs with 2 norm-free
SimplifiedBasicBlocks (conv_to_res=True; utils/res_layer.py:107 - no
norm, bias on, no final ReLU).

TPU-native notes: padded static RoI sets with validity masks; the
reference's align_corners=True relay upsample uses XLA's
align_corners=False bilinear (sub-pixel deviation, documented)."""
from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.anchors import bbox2delta, delta2bbox
from ..core.postprocess import batched_nms, filter_scores_and_topk
from ..ops.roi_align import multi_level_roi_align
from .cascade_rcnn import (STAGE_IOUS, STAGE_STDS, STAGE_WEIGHTS,
                           CascadeRCNN, _stage_sample_and_targets)
from .htc import _sem_roi, semantic_seg_loss  # noqa: F401 (re-export)
from .mask_rcnn import MASK_SIZE


class SimplifiedBasicBlock(nn.Module):
    """utils/res_layer.py:107 (norm-free form): conv-relu-conv + skip,
    NO final relu."""
    channels: int = 256

    @nn.compact
    def __call__(self, x):
        idn = x
        if x.shape[-1] != self.channels:
            idn = nn.Conv(self.channels, (1, 1), name="downsample")(x)
        y = nn.relu(nn.Conv(self.channels, (3, 3),
                            padding=[(1, 1), (1, 1)], name="conv1")(x))
        y = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                    name="conv2")(y)
        return idn + y


class SCNetBBoxHead(nn.Module):
    """scnet_bbox_head.py: Shared2FC cascade head that also exposes the
    shared fc feature (return_shared_feat) for the relay head."""
    num_classes: int = 80
    fc_channels: int = 1024

    @nn.compact
    def __call__(self, roi_feats):
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_channels, name="shared_fc0")(x))
        x = nn.relu(nn.Dense(self.fc_channels, name="shared_fc1")(x))
        cls = nn.Dense(self.num_classes + 1,
                       kernel_init=nn.initializers.normal(0.01),
                       name="fc_cls")(x)
        reg = nn.Dense(4, kernel_init=nn.initializers.normal(0.001),
                       name="fc_reg")(x)
        return cls, reg, x


class GlobalContextHead(nn.Module):
    """global_context_head.py (conv_to_res=True): 2 SimplifiedBasicBlocks
    on the last FPN level -> GAP -> per-class logits + context vector."""
    num_classes: int = 80
    channels: int = 256
    num_res_blocks: int = 2

    @nn.compact
    def __call__(self, feats):
        x = feats[-1]
        for i in range(self.num_res_blocks):
            x = SimplifiedBasicBlock(self.channels, name=f"res{i}")(x)
        ctx = x.mean(axis=(1, 2))                       # (B, C)
        mc = nn.Dense(self.num_classes,
                      kernel_init=nn.initializers.normal(0.01),
                      name="fc")(ctx)
        return mc, ctx


def glbctx_loss(mc_pred, gt_labels, gt_valid, loss_weight: float = 3.0):
    """Multi-label BCE against the set of classes present in each image
    (global_context_head.py loss)."""
    C = mc_pred.shape[-1]
    onehot = jax.nn.one_hot(jnp.clip(gt_labels, 0, C - 1), C) \
        * gt_valid[..., None]
    targets = (onehot.sum(axis=1) > 0).astype(jnp.float32)  # (B, C)
    return loss_weight * L.bce_loss(mc_pred.reshape(-1),
                                    targets.reshape(-1),
                                    avg_factor=float(mc_pred.size))


class FeatureRelayHead(nn.Module):
    """feature_relay_head.py: shared fc (1024) -> (7, 7, 256) -> x2
    bilinear upsample to the 14x14 mask grid."""
    channels: int = 256
    roi_size: int = 7

    @nn.compact
    def __call__(self, shared_feat):
        M = shared_feat.shape[0]
        s = self.roi_size
        x = nn.Dense(s * s * self.channels, name="fc")(shared_feat)
        x = x.reshape(M, s, s, self.channels)
        return jax.image.resize(x, (M, 2 * s, 2 * s, self.channels),
                                method="bilinear")


class SCNetMaskHead(nn.Module):
    """scnet_mask_head.py: 2 SimplifiedBasicBlocks -> x2 deconv -> logits."""
    num_classes: int = 80
    channels: int = 256
    num_res_blocks: int = 2

    @nn.compact
    def __call__(self, roi_feats14):
        x = roi_feats14
        for i in range(self.num_res_blocks):
            x = SimplifiedBasicBlock(self.channels, name=f"res{i}")(x)
        x = nn.relu(nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                                     name="upsample")(x))
        return nn.Conv(self.num_classes, (1, 1), name="logits")(x)


class SCNetOutputs(NamedTuple):
    rpn: object
    neck_feats: Tuple[jnp.ndarray, ...]
    sem_pred: jnp.ndarray
    sem_feat: jnp.ndarray
    mc_pred: jnp.ndarray      # (B, C) global-context logits
    glbctx: jnp.ndarray       # (B, 256) context vectors


class SCNet(CascadeRCNN):
    semantic_classes: int = 183

    def setup(self):
        # cascade trunk with relay-capable bbox heads (cannot call
        # super().setup(): flax forbids re-binding the bbox_head names)
        from .fpn import FPN
        from .resnet import ResNet
        from .faster_rcnn import RPNHead
        self.backbone = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                               frozen_stages=self.frozen_stages)
        self.neck = FPN(out_channels=256, num_outs=5, start_level=0,
                        add_extra_convs="")
        self.rpn_head = RPNHead()
        self.bbox_heads = [SCNetBBoxHead(num_classes=self.num_classes,
                                         name=f"bbox_head{i}")
                           for i in range(self.num_stages)]
        from .htc import FusedSemanticHead
        # conv_to_res=True: SCNetSemanticHead swaps the 4 convs for 2
        # SimplifiedBasicBlocks (configs/scnet semantic_head)
        self.semantic_head = FusedSemanticHead(
            num_classes=self.semantic_classes, conv_to_res=True,
            name="semantic_head")
        self.glbctx_head = GlobalContextHead(num_classes=self.num_classes,
                                             name="glbctx_head")
        self.relay_head = FeatureRelayHead(name="feat_relay_head")
        self.mask_head = SCNetMaskHead(num_classes=self.num_classes,
                                       name="mask_head")

    def __call__(self, images, img_hw, deterministic: bool = True):
        feats = self.backbone(images)
        neck = self.neck(feats)
        sem_pred, sem_feat = self.semantic_head(neck)
        mc, ctx = self.glbctx_head(neck)
        return SCNetOutputs(self.rpn_head(neck), neck, sem_pred, sem_feat,
                            mc, ctx)

    def roi_forward(self, roi_feats, stage: int):
        return self.bbox_heads[stage](roi_feats)

    def mask_forward(self, roi_feats14, shared_feat):
        relayed = self.relay_head(shared_feat)
        return self.mask_head(roi_feats14 + relayed)

    def init_all(self, images, img_hw, deterministic: bool = True):
        out = self(images, img_hw, deterministic)
        z7 = jnp.zeros((1, 7, 7, 256), images.dtype)
        for i in range(self.num_stages):
            self.bbox_heads[i](z7)
        self.mask_forward(jnp.zeros((1, 14, 14, 256), images.dtype),
                          jnp.zeros((1, 1024), images.dtype))
        return out


def scnet_forward_train(apply_roi, apply_mask, out: SCNetOutputs,
                        proposals, proposal_valid, gt_bboxes, gt_labels,
                        gt_valid, gt_masks, rng, num_classes: int,
                        num_samples: int = 512,
                        pos_fraction: float = 0.25,
                        mask_stride: int = 4):
    """Cascade stages with semantic + global-context fusion; ONE mask
    pass on the last stage's positives with relayed bbox features
    (scnet_roi_head.forward_train)."""
    from .mask_rcnn import mask_loss, mask_targets
    B = proposals.shape[0]
    losses = {}
    rois = jnp.concatenate([proposals, gt_bboxes], axis=1)
    rois_valid = jnp.concatenate([proposal_valid, gt_valid], axis=1)
    feats_pi = [tuple(f[b] for f in out.neck_feats[:4]) for b in range(B)]
    P = max(1, num_samples // 4)

    def roi_feats(rois_s, valid_s, out_size):
        f = jnp.stack([
            multi_level_roi_align(feats_pi[b], rois_s[b], valid_s[b],
                                  out_size=out_size)
            + _sem_roi(out.sem_feat[b], rois_s[b], valid_s[b], out_size)
            for b in range(B)])
        # global context: one vector per image added to every RoI cell
        return f + out.glbctx[:, None, None, None, :]

    last = None
    for stage, (iou, stds, wgt) in enumerate(
            zip(STAGE_IOUS, STAGE_STDS, STAGE_WEIGHTS)):
        rngs = jax.random.split(jax.random.fold_in(rng, stage), B)
        idx, valid, is_pos, labels, tgt_boxes, gt_idx = jax.vmap(
            lambda r, ro, rv, b, l, v: _stage_sample_and_targets(
                r, ro, rv, b, l, v, num_classes, iou, num_samples,
                pos_fraction))(rngs, rois, rois_valid, gt_bboxes,
                               gt_labels, gt_valid)
        sampled = jnp.take_along_axis(rois, idx[..., None], axis=1)
        S = sampled.shape[1]
        f7 = roi_feats(sampled, valid, 7)
        cls_logits, reg, shared = apply_roi(
            f7.reshape(B * S, 7, 7, -1), stage)

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
        last = dict(sampled=sampled, valid=valid, is_pos=is_pos,
                    labels=labels, gt_idx=gt_idx,
                    shared=shared.reshape(B, S, -1))
        refined = delta2bbox(sampled.reshape(-1, 4), reg, stds=stds)
        rois = jax.lax.stop_gradient(refined.reshape(B, S, 4))
        rois_valid = valid

    # single mask pass on the LAST stage's leading positives
    rois_p = last["sampled"][:, :P]
    pos_v = last["is_pos"][:, :P]
    lab_p = last["labels"][:, :P]
    gi_p = last["gt_idx"][:, :P]
    shared_p = last["shared"][:, :P]
    f14 = roi_feats(rois_p, pos_v, 14)
    logits = apply_mask(f14.reshape(B * P, 14, 14, -1),
                        shared_p.reshape(B * P, -1))
    gm = jax.vmap(lambda m, i: m[i])(gt_masks, gi_p)
    tgt = mask_targets(rois_p.reshape(-1, 4),
                       gm.reshape((B * P,) + gm.shape[2:]), mask_stride)
    losses["loss_mask"] = mask_loss(logits, jax.lax.stop_gradient(tgt),
                                    lab_p.reshape(-1), pos_v.reshape(-1))
    return losses


def scnet_get_bboxes(apply_roi, out: SCNetOutputs, proposals,
                     proposal_valid, img_hw, num_classes: int,
                     scale_factor=None, score_thr: float = 0.05,
                     nms_iou: float = 0.5, max_per_img: int = 100,
                     rescale: bool = False):
    """Cascade ensemble decode with semantic + glbctx bbox fusion; also
    returns the LAST stage's shared features per surviving detection
    for the relay-fused mask pass."""
    B, S = proposals.shape[:2]
    feats_pi = [tuple(f[b] for f in out.neck_feats[:4]) for b in range(B)]
    rois = proposals
    stage_scores = []
    for stage, stds in enumerate(STAGE_STDS):
        f7 = jnp.stack([
            multi_level_roi_align(feats_pi[b], rois[b], proposal_valid[b])
            + _sem_roi(out.sem_feat[b], rois[b], proposal_valid[b], 7)
            for b in range(B)]) + out.glbctx[:, None, None, None, :]
        cls_logits, reg, shared = apply_roi(
            f7.reshape(B * S, 7, 7, -1), stage)
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
        nb, ns, nl, keep, kidx = batched_nms(
            boxes[top.keep_idxs], top.scores, top.labels, nms_iou,
            max_per_img, valid=top.valid)
        nb_in = nb                          # input-coordinate boxes
        if rescale and sf is not None:
            nb = nb / sf[None]
        return nb, ns, nl, keep, nb_in

    if scale_factor is None:
        scale_factor = jnp.ones((B, 4), jnp.float32)
    nb, ns, nl, keep, nb_in = jax.vmap(per_image)(
        refined, proposal_valid, probs, scale_factor)
    # the relayed feature re-pools the LAST bbox head at the FINAL
    # detection boxes (scnet_roi_head.py:447-461 builds mask_rois from
    # the post-NMS dets and re-runs _bbox_forward(-1)) — NOT the stale
    # stage-input features
    R = nb_in.shape[1]
    f7d = jnp.stack([
        multi_level_roi_align(feats_pi[b], nb_in[b], keep[b])
        + _sem_roi(out.sem_feat[b], nb_in[b], keep[b], 7)
        for b in range(B)]) + out.glbctx[:, None, None, None, :]
    _, _, shared_det = apply_roi(
        f7d.reshape(B * R, 7, 7, -1), len(STAGE_STDS) - 1)
    shared_det = shared_det.reshape(B, R, -1)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=keep,
                shared=shared_det)


def scnet_mask_probs(model, variables, out: SCNetOutputs, det_boxes,
                     det_valid, det_shared):
    """(B, R, 28, 28, C) sigmoid probs on the final boxes, with
    semantic + glbctx + relayed-feature fusion."""
    B, R = det_boxes.shape[:2]
    feats_pi = [tuple(f[b] for f in out.neck_feats[:4]) for b in range(B)]
    f14 = jnp.stack([
        multi_level_roi_align(feats_pi[b], det_boxes[b], det_valid[b],
                              out_size=14)
        + _sem_roi(out.sem_feat[b], det_boxes[b], det_valid[b], 14)
        for b in range(B)]) + out.glbctx[:, None, None, None, :]
    logits = model.apply(variables, f14.reshape(B * R, 14, 14, -1),
                         det_shared.reshape(B * R, -1),
                         method=SCNet.mask_forward)
    return jax.nn.sigmoid(logits).reshape(B, R, MASK_SIZE, MASK_SIZE, -1)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return SCNet(num_classes=m.num_classes, depth=m.depth,
                     frozen_stages=m.frozen_stages)

    def losses(model, cfg, **_):
        from ..models.faster_rcnn import (RPNLossConfig, rpn_loss,
                                          rpn_proposals)
        from ..models.htc import semantic_seg_loss
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
        return step

    register_family("scnet", build=build, losses=losses,
                    eval_step=eval_step, init_all=True, with_mask=True,
                    with_semantic=True)


_register()

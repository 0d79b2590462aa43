"""QueryInst (parity: mmdet detectors/queryinst.py +
roi_heads/sparse_roi_head.py mask path +
mask_heads/dynamic_mask_head.py; configs/queryinst/
queryinst_r50_fpn_1x_coco.py, box AP 42.0 / mask AP 37.5).

"Instances as Queries": Sparse R-CNN plus a per-stage DynamicMaskHead -
each stage's post-self-attention proposal features (attn_feats,
dii_head.py:171) drive a DynamicConv over the 14x14 RoI features of that
stage's PREDICTED boxes (with_proj=False: per-position features), then 4
convs + x2 deconv + per-class 28x28 logits, trained with DiceLoss
(V-Net squared-denominator form, eps=1e-3, weight 8.0) at the GT class,
averaged over positives (dynamic_mask_head.py loss).

TPU-native re-design: the reference runs the mask head only on the
dynamically-many Hungarian positives; here the assignment is INVERTED to
static (B, G) query indices (at most one query per GT under Hungarian),
so every stage's mask branch runs on exactly G RoIs per image with a
validity mask - no dynamic shapes, and the work scales with the GT
bucket, not num_proposals. The reference's mask convs use BN
(norm_cfg=BN); here GroupNorm(32) replaces it (batch-size-independent,
the standard TPU substitution) - documented deviation, converter must
fold BN stats if importing reference weights."""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.roi_align import multi_level_roi_align
from .sparse_rcnn import (NUM_PROPOSALS, NUM_STAGES, DynamicConv,
                          SparseRCNN, SparseRCNNLossConfig,
                          sparse_rcnn_loss)

MASK_SIZE = 28


class DynamicMaskHead(nn.Module):
    """dynamic_mask_head.py: proposal-conditioned conv over 14x14 RoI
    features -> 4 convs -> x2 deconv -> per-class mask logits."""
    num_classes: int = 80
    channels: int = 256
    num_convs: int = 4

    @nn.compact
    def __call__(self, roi_feat14, proposal_feat):
        """roi (M, 14, 14, C) + proposal (M, C) -> (M, 28, 28, classes)."""
        M, S = roi_feat14.shape[0], roi_feat14.shape[1]
        x = DynamicConv(self.channels, pool=S, with_proj=False,
                        name="instance_interactive_conv")(
            proposal_feat, roi_feat14)
        x = x.reshape(M, S, S, self.channels)
        for i in range(self.num_convs):
            x = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, name=f"conv{i}")(x)
            x = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                     name=f"gn{i}")(x))
        x = nn.relu(nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                                     name="upsample")(x))
        return nn.Conv(self.num_classes, (1, 1), name="logits")(x)


class QueryInst(nn.Module):
    """detectors/queryinst.py: SparseRCNN trunk + per-stage mask heads."""
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = 1
    num_proposals: int = NUM_PROPOSALS
    num_stages: int = NUM_STAGES

    def setup(self):
        self.detector = SparseRCNN(
            num_classes=self.num_classes, depth=self.depth,
            frozen_stages=self.frozen_stages,
            num_proposals=self.num_proposals,
            num_stages=self.num_stages, with_attn=True, name="detector")
        self.mask_heads = [DynamicMaskHead(num_classes=self.num_classes,
                                           name=f"mask_head{i}")
                           for i in range(self.num_stages)]

    def __call__(self, images, img_hw, deterministic: bool = True):
        return self.detector(images, img_hw, deterministic)

    def mask_forward(self, roi_feat14, proposal_feat, stage: int):
        return self.mask_heads[stage](roi_feat14, proposal_feat)

    def init_all(self, images, img_hw, deterministic: bool = True):
        out = self(images, img_hw, deterministic)
        for h in self.mask_heads:
            h(jnp.zeros((1, 14, 14, 256), images.dtype),
              jnp.zeros((1, 256), images.dtype))
        return out


def invert_assignment(assigned_gt, pos_mask, num_gt: int):
    """Hungarian result (B, N) -> per-GT matched query index (B, G) +
    match flag. At most one query matches each GT, so the argmax is
    exact."""
    N = assigned_gt.shape[1]
    onehot = (assigned_gt[:, :, None] == jnp.arange(num_gt)[None, None]) \
        & pos_mask[:, :, None]                           # (B, N, G)
    qidx = jnp.argmax(onehot, axis=1)                    # (B, G)
    matched = onehot.any(axis=1)
    return qidx, matched


def dice_loss(pred_sig, target, valid, eps: float = 1e-3):
    """V-Net dice (losses/dice_loss.py naive_dice=False, default
    eps=1e-3), averaged over valid instances. pred_sig/target:
    (M, H, W); valid: (M,)."""
    p = pred_sig.reshape(pred_sig.shape[0], -1)
    t = target.reshape(target.shape[0], -1)
    a = (p * t).sum(-1)
    b = (p * p).sum(-1) + eps
    c = (t * t).sum(-1) + eps
    loss = 1.0 - 2.0 * a / (b + c)
    vf = valid.astype(jnp.float32)
    return (loss * vf).sum() / jnp.maximum(vf.sum(), 1.0)


def queryinst_loss(model, variables, out, gt_bboxes, gt_labels, gt_valid,
                   gt_masks, img_hw, cfg: SparseRCNNLossConfig,
                   mask_stride: int = 4, mask_weight: float = 8.0):
    """Sparse R-CNN set losses + per-stage dynamic-mask dice losses on
    the GT-matched queries (sparse_roi_head.py _mask_forward_train)."""
    from .mask_rcnn import mask_targets
    losses, assigns = sparse_rcnn_loss(out, gt_bboxes, gt_labels,
                                       gt_valid, img_hw, cfg,
                                       return_assigns=True)
    B, G = gt_bboxes.shape[:2]
    S = out.cls_scores.shape[0]
    feats_pi = [tuple(f[b] for f in out.neck_feats) for b in range(B)]
    for s in range(S):
        res = assigns[s]
        qidx, matched = invert_assignment(res.assigned_gt, res.pos_mask, G)
        # DETACHED proposals for the mask path (sparse_roi_head.py:147
        # builds mask sampling results from detach_proposal_list) — dice
        # gradients must not leak into the box deltas through the
        # bilinear sampling coordinates of roi_align
        boxes = jax.lax.stop_gradient(
            jnp.take_along_axis(out.bboxes[s], qidx[..., None], axis=1))
        attn = jnp.take_along_axis(out.attn_feats[s], qidx[..., None],
                                   axis=1)                # (B, G, C)
        f14 = jnp.stack([
            multi_level_roi_align(feats_pi[b], boxes[b], matched[b],
                                  out_size=14) for b in range(B)])
        logits = model.apply(
            variables, f14.reshape(B * G, 14, 14, -1),
            attn.reshape(B * G, -1), s, method=QueryInst.mask_forward)
        tgt = mask_targets(boxes.reshape(-1, 4),
                           gt_masks.reshape((B * G,) + gt_masks.shape[2:]),
                           mask_stride)
        lab = jnp.clip(gt_labels.reshape(-1), 0, logits.shape[-1] - 1)
        sel = jnp.take_along_axis(logits, lab[:, None, None, None],
                                  axis=-1)[..., 0]
        loss = dice_loss(jax.nn.sigmoid(sel),
                         jax.lax.stop_gradient(tgt),
                         matched.reshape(-1))
        pre = "" if s == S - 1 else f"s{s}."
        losses[pre + "loss_mask"] = mask_weight * loss
    return losses


def queryinst_masks(model, variables, out, det_boxes, det_qidx, det_valid):
    """(B, R, 28, 28, C) last-stage mask probs for the decoded detections
    (sparse_roi_head.simple_test: final boxes + last-stage attn feats)."""
    B, R = det_boxes.shape[:2]
    feats_pi = [tuple(f[b] for f in out.neck_feats) for b in range(B)]
    attn = jnp.take_along_axis(out.attn_feats[-1], det_qidx[..., None],
                               axis=1)
    f14 = jnp.stack([
        multi_level_roi_align(feats_pi[b], det_boxes[b], det_valid[b],
                              out_size=14) for b in range(B)])
    logits = model.apply(
        variables, f14.reshape(B * R, 14, 14, -1),
        attn.reshape(B * R, -1), model.num_stages - 1,
        method=QueryInst.mask_forward)
    return jax.nn.sigmoid(logits).reshape(B, R, MASK_SIZE, MASK_SIZE, -1)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return QueryInst(num_classes=m.num_classes, depth=m.depth,
                         frozen_stages=m.frozen_stages,
                         num_proposals=m.num_query)

    def losses(model, cfg, **_):
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
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..models.sparse_rcnn import sparse_rcnn_get_bboxes
        from ..utils.det import DetM

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
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
        return step

    register_family("queryinst", build=build, losses=losses,
                    eval_step=eval_step, init_all=True, with_mask=True)


_register()

"""Mask Scoring R-CNN (parity: mmdet detectors/mask_scoring_rcnn.py +
roi_heads/mask_scoring_roi_head.py + mask_heads/maskiou_head.py +
configs/ms_rcnn, box AP 38.2 / mask AP 36.0 @ R50-1x).

A Mask R-CNN whose extra MaskIoU head regresses the IoU between each
predicted mask and its GT instance; at test time the regressed IoU
multiplies the classification score to rank segm detections by actual
mask quality (https://arxiv.org/abs/1903.00241).

TPU-first notes: the reference's per-image python loop over positives
(maskiou_head.py get_targets / _get_area_ratio: crop each GT mask to its
proposal on the host) becomes a fully batched computation on the padded
stride-4 GT bitmaps — the inside-box area uses a box-region mask over
the bitmap grid, so target computation stays on device with static
shapes.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .mask_rcnn import MASK_SIZE, MaskRCNN


class MaskIoUHead(nn.Module):
    """maskiou_head.py:13-88: concat(mask_feat, maxpooled mask pred) ->
    4 convs (last stride 2: 14 -> 7) -> 2 fcs -> per-class mask IoU."""
    num_classes: int = 80
    num_convs: int = 4
    num_fcs: int = 2
    channels: int = 256
    fc_channels: int = 1024

    @nn.compact
    def __call__(self, mask_feat, mask_pred):
        """mask_feat (P, 14, 14, C), mask_pred (P, 28, 28) logits of the
        selected class channel -> (P, num_classes) IoU predictions."""
        mp = jax.nn.sigmoid(mask_pred)[..., None]          # (P, 28, 28, 1)
        mp = nn.max_pool(mp, (2, 2), strides=(2, 2))       # -> 14x14
        x = jnp.concatenate([mask_feat, mp], axis=-1)
        for i in range(self.num_convs):
            stride = 2 if i == self.num_convs - 1 else 1
            x = nn.relu(nn.Conv(self.channels, (3, 3),
                                strides=(stride, stride),
                                padding=[(1, 1), (1, 1)],
                                name=f"conv{i}")(x))
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_channels, name=f"fc{i}")(x))
        return nn.Dense(self.num_classes, name="fc_mask_iou")(x)


class MSRCNN(MaskRCNN):
    """Mask R-CNN + MaskIoU head (detectors/mask_scoring_rcnn.py)."""

    def setup(self):
        super().setup()
        self.mask_iou_head = MaskIoUHead(num_classes=self.num_classes)

    def maskiou_forward(self, mask_feat, mask_pred):
        return self.mask_iou_head(mask_feat, mask_pred)

    def init_all(self, images, img_hw, deterministic: bool = True):
        out = super().init_all(images, img_hw, deterministic)
        self.mask_iou_head(jnp.zeros((1, 14, 14, 256), images.dtype),
                           jnp.zeros((1, MASK_SIZE, MASK_SIZE),
                                     images.dtype))
        return out


def maskiou_targets(sel_logits, tgt28, rois, gt_mask_sel,
                    mask_stride: int = 4, thr: float = 0.5):
    """maskiou_head.py:99-146 get_targets, batched with static shapes.

    sel_logits (P, 28, 28): predicted-class mask logits; tgt28
    (P, 28, 28): binary 28x28 GT crop; rois (P, 4) xyxy image coords;
    gt_mask_sel (P, Hm, Wm): matched GT bitmap at ``mask_stride``.

    IoU target = overlap / (pred_area + gt_full_area - overlap), where
    gt_full_area rescales the in-box target area by the fraction of the
    whole instance that lies inside the box (area_ratio) — both areas in
    28x28-target units so the ratio is resolution-free.
    """
    # reference quirk: get_targets thresholds the RAW LOGITS against
    # mask_thr_binary=0.5 (maskiou_head.py:134 — pos_mask_pred is never
    # sigmoided before the comparison), i.e. effectively sigmoid > 0.622
    pred = (sel_logits > thr).astype(jnp.float32)
    pred_area = pred.sum(axis=(-2, -1))
    overlap = (pred * tgt28).sum(axis=(-2, -1))
    # area ratio on the stride-4 bitmap: inside-box gt area / whole area
    Hm, Wm = gt_mask_sel.shape[-2:]
    yc = (jnp.arange(Hm, dtype=jnp.float32) + 0.5) * mask_stride
    xc = (jnp.arange(Wm, dtype=jnp.float32) + 0.5) * mask_stride
    inside = ((yc[None, :, None] >= rois[:, 1, None, None])
              & (yc[None, :, None] <= rois[:, 3, None, None])
              & (xc[None, None, :] >= rois[:, 0, None, None])
              & (xc[None, None, :] <= rois[:, 2, None, None]))
    whole = gt_mask_sel.sum(axis=(-2, -1))
    in_box = (gt_mask_sel * inside).sum(axis=(-2, -1))
    ratio = in_box / jnp.maximum(whole, 1e-7)
    gt_full = tgt28.sum(axis=(-2, -1)) / (ratio + 1e-7)
    return overlap / jnp.maximum(pred_area + gt_full - overlap, 1e-7)


def maskiou_loss(iou_pred_sel, iou_tgt, pos_valid, weight: float = 0.5):
    """MSE on positives with target > 0 (maskiou_head.py:89-97 loss,
    loss_iou=MSELoss(loss_weight=0.5) per configs/ms_rcnn)."""
    w = (pos_valid & (iou_tgt > 0)).astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    return weight * (w * (iou_pred_sel - iou_tgt) ** 2).sum() / n


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return MSRCNN(num_classes=m.num_classes, depth=m.depth,
                      frozen_stages=m.frozen_stages)

    def losses(model, cfg, **_):
        from .mask_rcnn import mask_family_losses
        return mask_family_losses(model, cfg, mask_scoring=True)

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..models.faster_rcnn import rcnn_get_bboxes, rpn_proposals
        from ..ops.roi_align import multi_level_roi_align
        from ..utils.det import DetS

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            # Mask R-CNN path + MaskIoU rescoring: segm detections are
            # ranked by cls_score * predicted mask IoU
            # (mask_scoring_roi_head.py simple_test_mask + maskiou_head
            # get_mask_scores)
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
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
        return step

    register_family("ms_rcnn", build=build, losses=losses,
                    eval_step=eval_step, init_all=True, with_mask=True)


_register()

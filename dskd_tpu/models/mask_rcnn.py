"""Mask R-CNN (parity: mmdet detectors/mask_rcnn.py +
roi_heads/mask_heads/fcn_mask_head.py + roi_heads/standard_roi_head.py
mask branch + configs/mask_rcnn, box AP 38.2 / mask AP 34.7 @ R50-1x).

TPU-first static-shape design:
  * the sampled-ROI layout from ``rcnn_forward_train`` is positives-FIRST
    (pos_idx then neg_idx slots), so the mask branch slices the leading
    ``num_samples * pos_fraction`` rows instead of gathering a dynamic
    positive set;
  * GT instance masks ride the batch as padded bitmaps at a fixed
    ``mask_stride`` (default 4) — (B, G, H/4, W/4) — instead of the
    reference's per-image full-resolution BitmapMasks list (mask targets
    are crops of these bitmaps, so stride 4 costs <1px of target
    resolution at the 28x28 target size);
  * mask pasting samples the 28x28 grid back at image coordinates with a
    single gather-free bilinear map (mmdet's _do_paste_mask contract)
    rather than scattering per-instance rectangles.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from .faster_rcnn import BBoxHead, RPNHead
from .fpn import FPN
from .resnet import ResNet

MASK_SIZE = 28


class FCNMaskHead(nn.Module):
    """fcn_mask_head.py: 4 convs -> x2 deconv -> per-class 1x1 logits."""
    num_classes: int = 80
    num_convs: int = 4
    channels: int = 256

    @nn.compact
    def __call__(self, roi_feats):
        """(M, 14, 14, C) -> (M, 28, 28, num_classes) mask logits."""
        x = roi_feats
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.channels, (3, 3),
                                padding=[(1, 1), (1, 1)],
                                name=f"conv{i}")(x))
        x = nn.relu(nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                                     name="upsample")(x))
        return nn.Conv(self.num_classes, (1, 1), name="logits")(x)


class MaskRCNNOutputs(NamedTuple):
    rpn: object
    neck_feats: Tuple[jnp.ndarray, ...]


class MaskRCNN(nn.Module):
    """Two-stage box detector + FCN mask branch (detectors/mask_rcnn.py:
    StandardRoIHead with both bbox_head and mask_head).

    ``seesaw``: the LVIS long-tail recipe (configs/seesaw_loss/
    mask_rcnn_*_seesaw_loss_*_lvis_v1.py) — SeesawLoss ROI classifier
    (C+2 channels) whose per-class cumulative sample counts are
    batch_stats state threaded through the train step."""
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = 1
    seesaw: bool = False
    # GCNet backbone plugin stages (configs/gcnet mask_rcnn variants)
    gcb_stages: tuple = (False, False, False, False)
    gcb_ratio: float = 0.25
    # backbone spec (models/backbones.py) — the reference configs/swin
    # mask_rcnn_swin-t_p4_w7_fpn pairing ('' = ResNet(depth))
    backbone_spec: str = ""

    def setup(self):
        if self.backbone_spec:
            from .backbones import build_backbone
            self.backbone, _ = build_backbone(
                self.backbone_spec, self.depth, self.frozen_stages)
        else:
            self.backbone = ResNet(depth=self.depth,
                                   out_indices=(0, 1, 2, 3),
                                   frozen_stages=self.frozen_stages,
                                   gcb_stages=self.gcb_stages,
                                   gcb_ratio=self.gcb_ratio)
        self.neck = FPN(out_channels=256, num_outs=5, start_level=0,
                        add_extra_convs="")
        self.rpn_head = RPNHead()
        self.roi_bbox_head = BBoxHead(num_classes=self.num_classes,
                                      seesaw=self.seesaw)
        self.mask_head = FCNMaskHead(num_classes=self.num_classes)
        if self.seesaw:
            self.variable("batch_stats", "seesaw_cum",
                          lambda: jnp.zeros((self.num_classes + 1,),
                                            jnp.float32))

    def __call__(self, images, img_hw, deterministic: bool = True):
        from .backbones import apply_backbone
        feats = apply_backbone(self.backbone, self.backbone_spec, images,
                               deterministic)
        neck = self.neck(feats)
        return MaskRCNNOutputs(self.rpn_head(neck), neck)

    def roi_forward(self, roi_feats):
        return self.roi_bbox_head(roi_feats)

    def mask_forward(self, roi_feats14):
        return self.mask_head(roi_feats14)

    def init_all(self, images, img_hw, deterministic: bool = True):
        out = self(images, img_hw, deterministic)
        self.roi_bbox_head(jnp.zeros((1, 7, 7, 256), images.dtype))
        self.mask_head(jnp.zeros((1, 14, 14, 256), images.dtype))
        return out


def mask_targets(rois, gt_mask_sel, mask_stride: int = 4,
                 size: int = MASK_SIZE):
    """Crop each positive ROI's matched GT bitmap to the ``size``^2 target
    (mask_target.py: roi-align the instance bitmap, threshold 0.5;
    size=7 for PointRend's coarse head).

    rois: (P, 4) xyxy image coords; gt_mask_sel: (P, Hm, Wm) bitmaps at
    ``mask_stride``. Returns (P, size, size) float 0/1.

    Each ROI samples its OWN bitmap, so the crop runs as two batched
    MXU matmuls (ops/roi_align.py roi_align_own_map) instead of the
    per-(roi, position) scalar gathers a vmapped roi_align lowers to —
    the measured 20%-of-step mask_rcnn hotspot (PERF.md finding 17)."""
    from ..ops.roi_align import roi_align_own_map
    c = roi_align_own_map(gt_mask_sel.astype(jnp.float32), rois,
                          out_size=size, spatial_scale=1.0 / mask_stride)
    return (c >= 0.5).astype(jnp.float32)


def mask_loss(mask_logits, targets, labels, pos_valid):
    """BCE at each positive's GT-class channel (fcn_mask_head.py loss:
    class-specific masks, averaged over positives)."""
    P = mask_logits.shape[0]
    sel = jnp.take_along_axis(
        mask_logits, jnp.clip(labels, 0, mask_logits.shape[-1] - 1)
        [:, None, None, None], axis=-1)[..., 0]        # (P, S, S)
    w = pos_valid.astype(jnp.float32)[:, None, None]
    navg = jnp.maximum(pos_valid.sum().astype(jnp.float32), 1.0) \
        * sel.shape[1] * sel.shape[2]
    return L.bce_loss(sel.reshape(-1), targets.reshape(-1),
                      weight=jnp.broadcast_to(w, sel.shape).reshape(-1),
                      avg_factor=navg)


def paste_masks(masks28, boxes, out_hw, thr: float = 0.5):
    """(R, 28, 28) sigmoid probs + (R, 4) boxes -> (R, H, W) bool pasted
    masks (fcn_mask_head.py _do_paste_mask: bilinear-sample the 28-grid at
    every image pixel inside the box).

    Memory is R*H*W — paste at a downscaled out_hw or in chunks for large
    R; eval-time use only."""
    H, W = out_hw
    ys = jnp.arange(H, dtype=jnp.float32) + 0.5
    xs = jnp.arange(W, dtype=jnp.float32) + 0.5

    def one(m, b):
        bw = jnp.clip(b[2] - b[0], 1e-3)
        bh = jnp.clip(b[3] - b[1], 1e-3)
        gy = (ys - b[1]) / bh * MASK_SIZE - 0.5         # 28-grid coords
        gx = (xs - b[0]) / bw * MASK_SIZE - 0.5
        y0 = jnp.clip(jnp.floor(gy), 0, MASK_SIZE - 1)
        x0 = jnp.clip(jnp.floor(gx), 0, MASK_SIZE - 1)
        ty = jnp.clip(gy - y0, 0.0, 1.0)
        tx = jnp.clip(gx - x0, 0.0, 1.0)
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        y1i = jnp.minimum(y0i + 1, MASK_SIZE - 1)
        x1i = jnp.minimum(x0i + 1, MASK_SIZE - 1)
        v = (m[y0i][:, x0i] * (1 - ty)[:, None] * (1 - tx)[None]
             + m[y0i][:, x1i] * (1 - ty)[:, None] * tx[None]
             + m[y1i][:, x0i] * ty[:, None] * (1 - tx)[None]
             + m[y1i][:, x1i] * ty[:, None] * tx[None])
        inside = ((ys[:, None] >= b[1]) & (ys[:, None] <= b[3])
                  & (xs[None] >= b[0]) & (xs[None] <= b[2]))
        return (v >= thr) & inside

    return jax.vmap(one)(masks28, boxes)


def mask_rcnn_get_masks(model, variables, neck_feats, det_boxes, det_valid,
                        method=None):
    """Second-stage mask inference: 14x14 RoIAlign on the FINAL detection
    boxes -> mask head -> (B, R, 28, 28, num_classes) sigmoid probs
    (standard_roi_head.py simple_test_mask). Select the det's label
    channel and paste with ``paste_masks`` for full-image masks.
    ``method`` overrides the mask-forward bound method (PanopticFPN
    shares this path)."""
    from ..ops.roi_align import multi_level_roi_align
    B, R = det_boxes.shape[:2]
    feats_pi = [tuple(f[b] for f in neck_feats[:4]) for b in range(B)]
    f14 = jnp.stack([
        multi_level_roi_align(feats_pi[b], det_boxes[b], det_valid[b],
                              out_size=14) for b in range(B)])
    logits = model.apply(variables, f14.reshape(B * R, 14, 14, -1),
                         method=method or MaskRCNN.mask_forward)
    return jax.nn.sigmoid(logits).reshape(
        B, R, MASK_SIZE, MASK_SIZE, -1)


# --- family registrations (dskd_tpu/registry.py) ------------------------
# mask_rcnn + mask_rcnn_seesaw register here; ms_rcnn (models/ms_rcnn.py)
# and panoptic_fpn (models/panoptic_fpn.py) reuse mask_family_losses.

def mask_family_losses(model, cfg, *, seesaw=False, panoptic=False,
                       mask_scoring=False):
    """Shared Mask-R-CNN-family losses_fn factory (RPN + RCNN + mask
    branch, plus the seesaw/maskiou/semantic extras)."""
    from ..models.faster_rcnn import (RCNNLossConfig, RPNLossConfig,
                                      rcnn_forward_train, rpn_loss,
                                      rpn_proposals)
    from ..ops.roi_align import multi_level_roi_align
    rpn_cfg = RPNLossConfig()
    rcnn_cfg = RCNNLossConfig(num_classes=cfg.model.num_classes,
                              num_samples=cfg.rcnn_num_samples,
                              seesaw=seesaw)
    mask_stride = getattr(cfg, "mask_stride", 4)
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
            labf = jnp.clip(lab_p.reshape(-1), 0, logits.shape[-1] - 1)
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
    return losses_fn


def _register():
    from ..registry import register_family

    def build(cfg, arch):
        m = cfg.model
        return MaskRCNN(num_classes=m.num_classes, depth=m.depth,
                        frozen_stages=m.frozen_stages,
                        seesaw=(arch == "mask_rcnn_seesaw"),
                        gcb_stages=tuple(m.gcb_stages),
                        gcb_ratio=m.gcb_ratio,
                        backbone_spec=m.backbone)

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..models.faster_rcnn import rcnn_get_bboxes, rpn_proposals
        from ..utils.det import DetM
        seesaw = getattr(model, "seesaw", False)

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            # box path identical to Faster R-CNN; then 14x14 RoIAlign on
            # the final det boxes -> mask head -> per-det label-channel
            # 28x28 probs (simple_test_mask); paste happens host-side
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
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
        return step

    for name in ("mask_rcnn", "mask_rcnn_seesaw"):
        register_family(
            name,
            build=(lambda cfg, _a=name: build(cfg, _a)),
            losses=(lambda model, cfg, _a=name, **kw: mask_family_losses(
                model, cfg, seesaw=(_a == "mask_rcnn_seesaw"))),
            eval_step=eval_step, init_all=True, with_mask=True)


_register()

"""PointRend (parity: mmdet detectors/point_rend.py +
roi_heads/point_rend_roi_head.py + mask_heads/coarse_mask_head.py +
mask_heads/mask_point_head.py + models/utils/point_sample.py;
configs/point_rend/point_rend_r50_caffe_fpn_mstrain_1x_coco.py,
box AP 38.4 / mask AP 36.3).

Mask R-CNN whose FCN mask head is replaced by:
  * CoarseMaskHead: 14x14 RoI features -> k2/s2 downsample conv -> 2 fc
    layers -> per-class 7x7 coarse logits (no upsampling);
  * MaskPointHead: a pointwise MLP over [fine-grained P2 feature,
    coarse logit] per sampled point (coarse logits re-concatenated after
    every fc, coarse_pred_each_layer=True), predicting per-class point
    logits.

Train points: importance sampling over uncertainty (-|logit| of the GT
class) of 3x-oversampled random points, keeping the top 75% plus 25%
fresh random points (get_uncertain_point_coords_with_randomness); point
targets are the GT bitmap bilinearly sampled at those points; BCE at the
GT class. Test: iterative subdivision - upsample the coarse grid 2x,
re-predict the top-``num_points`` most uncertain cells, scatter the
refined logits in.

TPU-native notes: point counts are static (num_points padded per RoI,
invalid RoIs masked); the test refinement runs 2 subdivision steps
(7 -> 14 -> 28) so the refined mask drops into the framework's standard
28x28 segm protocol (the reference subdivides to 224 because its paste
happens at image resolution; here paste_masks upsamples from 28x28 for
every mask family - documented deviation, scales with MASK_SIZE)."""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from ..ops.point_sample import point_sample
from .faster_rcnn import FPN, BBoxHead, ResNet, RPNHead
from .mask_rcnn import MaskRCNNOutputs

COARSE_SIZE = 7


class CoarseMaskHead(nn.Module):
    """coarse_mask_head.py: downsample conv + 2 fcs -> 7x7 class logits."""
    num_classes: int = 80
    channels: int = 256
    fc_channels: int = 1024

    @nn.compact
    def __call__(self, roi_feats14):
        x = nn.relu(nn.Conv(self.channels, (2, 2), strides=(2, 2),
                            padding="VALID", name="downsample")(roi_feats14))
        x = x.reshape(x.shape[0], -1)
        # init parity (coarse_mask_head.py:31-35): Xavier fcs, fc_logits
        # CONSTANT 0.001 (every weight the same value, not normal noise)
        xav = nn.initializers.xavier_uniform()
        x = nn.relu(nn.Dense(self.fc_channels, kernel_init=xav,
                             name="fc0")(x))
        x = nn.relu(nn.Dense(self.fc_channels, kernel_init=xav,
                             name="fc1")(x))
        x = nn.Dense(self.num_classes * COARSE_SIZE * COARSE_SIZE,
                     kernel_init=nn.initializers.constant(0.001),
                     name="fc_logits")(x)
        return x.reshape(-1, COARSE_SIZE, COARSE_SIZE, self.num_classes)


class MaskPointHead(nn.Module):
    """mask_point_head.py: 3 pointwise fcs over [fine, coarse], coarse
    re-concatenated after each layer; per-class point logits."""
    num_classes: int = 80
    fc_channels: int = 256
    num_fcs: int = 3

    @nn.compact
    def __call__(self, fine_feats, coarse_logits):
        """fine (M, P, 256) + coarse (M, P, C) -> (M, P, C)."""
        x = jnp.concatenate([fine_feats, coarse_logits], axis=-1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_channels, name=f"fc{i}")(x))
            x = jnp.concatenate([x, coarse_logits], axis=-1)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(0.001),
                        name="fc_logits")(x)


class PointRendRCNN(nn.Module):
    """detectors/point_rend.py: Mask R-CNN trunk + PointRendRoIHead."""
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = 1

    def setup(self):
        self.backbone = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                               frozen_stages=self.frozen_stages)
        self.neck = FPN(out_channels=256, num_outs=5, start_level=0,
                        add_extra_convs="")
        self.rpn_head = RPNHead()
        self.roi_bbox_head = BBoxHead(num_classes=self.num_classes)
        self.coarse_head = CoarseMaskHead(num_classes=self.num_classes)
        self.point_head = MaskPointHead(num_classes=self.num_classes)

    def __call__(self, images, img_hw, deterministic: bool = True):
        feats = self.backbone(images)
        neck = self.neck(feats)
        return MaskRCNNOutputs(self.rpn_head(neck), neck)

    def roi_forward(self, roi_feats):
        return self.roi_bbox_head(roi_feats)

    def coarse_forward(self, roi_feats14):
        return self.coarse_head(roi_feats14)

    def point_forward(self, fine_feats, coarse_logits):
        return self.point_head(fine_feats, coarse_logits)

    def init_all(self, images, img_hw, deterministic: bool = True):
        out = self(images, img_hw, deterministic)
        self.roi_bbox_head(jnp.zeros((1, 7, 7, 256), images.dtype))
        c = self.coarse_head(jnp.zeros((1, 14, 14, 256), images.dtype))
        self.point_head(jnp.zeros((1, 4, 256), images.dtype), c[:, 0, :4])
        return out


def _uncertainty(logits_pc, labels):
    """-|logit| of the (GT or predicted) class (point_sample.py
    get_uncertainty). logits_pc: (M, ..., C); labels broadcastable to
    its leading dims."""
    lab = jnp.broadcast_to(jnp.clip(labels, 0, logits_pc.shape[-1] - 1),
                           logits_pc.shape[:-1])
    sel = jnp.take_along_axis(logits_pc, lab[..., None], axis=-1)
    return -jnp.abs(sel[..., 0])


def sample_train_points(rng, coarse, labels, num_points: int = 196,
                        oversample_ratio: int = 3,
                        importance_sample_ratio: float = 0.75):
    """get_uncertain_point_coords_with_randomness: uncertainty-importance
    sampling of 3x-oversampled random points + fresh random tail.
    coarse: (M, 7, 7, C). Returns (M, num_points, 2) in [0,1]^2."""
    M = coarse.shape[0]
    n_sampled = int(num_points * oversample_ratio)
    n_unc = int(importance_sample_ratio * num_points)
    n_rand = num_points - n_unc
    r1, r2 = jax.random.split(rng)
    pts = jax.random.uniform(r1, (M, n_sampled, 2))
    logits = point_sample(coarse, pts)                 # (M, S, C)
    unc = _uncertainty(logits, labels[:, None])        # (M, S)
    top = jax.lax.top_k(unc, n_unc)[1]                 # (M, n_unc)
    chosen = jnp.take_along_axis(pts, top[..., None], axis=1)
    fresh = jax.random.uniform(r2, (M, n_rand, 2))
    return jnp.concatenate([chosen, fresh], axis=1)


def rel_to_img_points(rois, rel_points, img_hw=None):
    """rel_roi_point_to_rel_img_point: RoI-relative [0,1]^2 points to
    image-space pixel coordinates. rois: (M, 4) xyxy."""
    x1, y1 = rois[:, 0:1], rois[:, 1:2]
    w = rois[:, 2:3] - x1
    h = rois[:, 3:4] - y1
    xs = x1 + rel_points[..., 0] * w
    ys = y1 + rel_points[..., 1] * h
    return jnp.stack([xs, ys], axis=-1)


def fine_grained_point_feats(p2_feat_b, rois_b, rel_points_b,
                             stride: int = 4):
    """Point-sample the single fine-grained level (P2, stride 4) at the
    image-space points (point_rend_roi_head.py
    _get_fine_grained_point_feats with featmap_strides=[4])."""
    img_pts = rel_to_img_points(rois_b, rel_points_b) / stride
    H, W = p2_feat_b.shape[:2]
    norm = img_pts / jnp.asarray([W, H], img_pts.dtype)
    M, P = norm.shape[:2]
    out = point_sample(jnp.broadcast_to(p2_feat_b[None],
                                        (M,) + p2_feat_b.shape), norm)
    return out                                          # (M, P, 256)


def simple_roi_align_p2(p2_feat_b, rois_b, valid_b, out_size: int = 14,
                        stride: int = 4):
    """mmcv SimpleRoIAlign on the single P2 level: bilinear point-sample
    at the out_size x out_size RoI cell centers ((j+0.5)/S, (i+0.5)/S).
    PointRend's mask extractor is GenericRoIExtractor(SimpleRoIAlign(14),
    featmap_strides=[4]) — the coarse head sees ONLY stride-4 features
    (configs/point_rend/point_rend_r50_caffe_fpn_mstrain_1x_coco.py:7-13).

    p2_feat_b: (H, W, C); rois_b: (M, 4) xyxy. Returns (M, S, S, C)."""
    S = out_size
    c = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
    gy, gx = jnp.meshgrid(c, c, indexing="ij")
    rel = jnp.stack([gx, gy], -1).reshape(1, S * S, 2)
    rel = jnp.broadcast_to(rel, (rois_b.shape[0], S * S, 2))
    out = fine_grained_point_feats(p2_feat_b, rois_b, rel, stride)
    out = out.reshape(-1, S, S, out.shape[-1])
    return out * valid_b[:, None, None, None]


def point_targets(rois, rel_points, gt_mask_sel, mask_stride: int = 4):
    """GT bitmap bilinearly sampled at the image-space points
    (mask_point_head.get_targets)."""
    img_pts = rel_to_img_points(rois, rel_points) / mask_stride
    Hm, Wm = gt_mask_sel.shape[1:3]
    norm = img_pts / jnp.asarray([Wm, Hm], img_pts.dtype)
    t = point_sample(gt_mask_sel[..., None].astype(jnp.float32), norm)
    return t[..., 0]                                    # (M, P)


def point_loss(point_logits, targets, labels, pos_valid):
    """BCE at the GT class channel, averaged over valid points
    (mask_point_head.loss, CrossEntropyLoss(use_mask=True))."""
    sel = jnp.take_along_axis(
        point_logits, jnp.clip(labels, 0, point_logits.shape[-1] - 1)
        [:, None, None], axis=-1)[..., 0]               # (M, P)
    w = jnp.broadcast_to(pos_valid.astype(jnp.float32)[:, None], sel.shape)
    navg = jnp.maximum(pos_valid.sum().astype(jnp.float32), 1.0) \
        * sel.shape[1]
    return L.bce_loss(sel.reshape(-1), targets.reshape(-1),
                      weight=w.reshape(-1), avg_factor=navg)


def refine_masks_test(apply_point, p2_feats, rois, rois_valid, labels,
                      coarse, subdivision_steps: int = 2,
                      num_points: int = 196):
    """Iterative subdivision refinement (point_rend_roi_head.py
    _mask_point_forward_test): upsample 2x, find the ``num_points`` most
    uncertain cells of the predicted class, re-predict them with the
    point head, scatter in. 2 steps: 7 -> 14 -> 28.

    Conscious deviation: the reference recipe runs 5 steps to 224x224
    over ALL class channels (test_cfg subdivision_steps=5,
    subdivision_num_points=784) — ~100 rois x 80 classes x 224^2 floats
    of live buffer. Here the refinement stops at the 28x28 paste
    resolution this framework rasterizes masks at, which is the
    same point budget relative to the output grid.

    rois: (B, R, 4); coarse: (B*R, 7, 7, C). Returns (B*R, 28, 28, C)."""
    B, R = rois.shape[:2]
    M = B * R
    refined = coarse
    rois_f = rois.reshape(M, 4)
    lab_f = labels.reshape(M)
    for _ in range(subdivision_steps):
        Hm = refined.shape[1] * 2
        refined = jax.image.resize(
            refined, (M, Hm, Hm, refined.shape[-1]), method="bilinear")
        unc = _uncertainty(refined,
                           lab_f[:, None, None]).reshape(M, Hm * Hm)
        k = min(num_points, Hm * Hm)
        idx = jax.lax.top_k(unc, k)[1]                  # (M, k)
        xs = (idx % Hm).astype(jnp.float32) / Hm + 0.5 / Hm
        ys = (idx // Hm).astype(jnp.float32) / Hm + 0.5 / Hm
        rel = jnp.stack([xs, ys], axis=-1)              # (M, k, 2)
        fine = jnp.concatenate([
            fine_grained_point_feats(
                p2_feats[b], rois_f[b * R:(b + 1) * R],
                rel[b * R:(b + 1) * R]) for b in range(B)], axis=0)
        coarse_pts = point_sample(coarse, rel)          # (M, k, C)
        pred = apply_point(fine, coarse_pts)            # (M, k, C)
        flat = refined.reshape(M, Hm * Hm, -1)
        onehot = jax.nn.one_hot(idx, Hm * Hm,
                                dtype=flat.dtype)       # (M, k, HW)
        repl = jnp.einsum("mkh,mkc->mhc", onehot, pred)
        hit = onehot.sum(axis=1)[..., None] > 0
        refined = jnp.where(hit, repl, flat).reshape(M, Hm, Hm, -1)
    return refined


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return PointRendRCNN(num_classes=m.num_classes, depth=m.depth,
                             frozen_stages=m.frozen_stages)

    def losses(model, cfg, **_):
        from ..models.faster_rcnn import (RCNNLossConfig, RPNLossConfig,
                                          rcnn_forward_train, rpn_loss,
                                          rpn_proposals)
        from ..models.mask_rcnn import mask_loss, mask_targets
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
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..models.faster_rcnn import rcnn_get_bboxes, rpn_proposals
        from ..utils.det import DetM

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
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
        return step

    register_family("point_rend", build=build, losses=losses,
                    eval_step=eval_step, init_all=True, with_mask=True)


_register()

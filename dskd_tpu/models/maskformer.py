"""MaskFormer (parity: mmdet detectors/maskformer.py +
dense_heads/maskformer_head.py + plugins/pixel_decoder.py
TransformerEncoderPixelDecoder + seg_heads/panoptic_fusion_heads/
maskformer_fusion_head.py; configs/maskformer/
maskformer_r50_mstrain_16x1_75e_coco.py, PQ 46.9).

Mask classification: a pixel decoder (FPN top-down whose top level first
runs a 6-layer DETR transformer encoder; GN(32) convs) produces per-pixel
mask features at stride 4 plus the encoder memory; 100 learned queries
run 6 DETR decoder layers against the memory; each decoder layer's
output yields (C+1)-way class logits and a 3-layer-MLP mask embedding
whose dot product with the mask features gives per-query mask logits.

Per-layer loss (maskformer_head.py loss_single): Hungarian on
[classification cost (-softmax prob), binary focal mask cost (w 20),
naive dice cost (w 1, eps 1)], then CE with background weight 0.1
(averaged by the matched class weights), sigmoid focal mask loss (w 20,
avg num_masks * h * w) and naive dice (w 1, eps 1, avg num_masks).

TPU-native notes: masks stay padded-static (Q queries vs G GT slots with
validity); GT masks arrive at stride 4 and the matching/losses run at
the prediction's stride-4 grid directly (the reference upsamples
predictions to full-res GT - same information, one resolution,
documented). Stuff classes enter as extra GT rows derived from the
semantic map when ``ModelConfig.panoptic`` is set (append_stuff_gt below;
the head grows to things + stuff); the shipped config trains the
instance (things only) protocol. Instance decode mirrors
maskformer_fusion_head.instance_postprocess with SOLO's mask-extent
boxes + 28x28 box-local resampling so the shared segm pipeline applies.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.matching import hungarian_assign
from .detr import DETRDecoderLayer, DETREncoderLayer
from .positional import sine_positional_encoding
from .resnet import ResNet

NUM_QUERIES = 100


class MaskFormerOutputs(NamedTuple):
    cls_scores: jnp.ndarray   # (nl, B, Q, C+1)
    mask_preds: jnp.ndarray   # (nl, B, Q, H/4, W/4) logits
    mask_feats: jnp.ndarray   # (B, H/4, W/4, 256)


def _gn_conv(x, ch, name):
    x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                name=f"{name}_conv")(x)
    return nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                name=f"{name}_gn")(x))


class TransformerEncoderPixelDecoder(nn.Module):
    """plugins/pixel_decoder.py:116: the top (C5) level runs a DETR
    encoder, then a GN-conv FPN top-down to stride 4; 3x3 mask_feature
    conv on the final map. Returns (mask_feature, memory, mem_pad)."""
    channels: int = 256
    num_encoder_layers: int = 6

    @nn.compact
    def __call__(self, feats, img_hw, images_hw,
                 deterministic: bool = True):
        top = feats[-1]
        B, H, W, _ = top.shape
        sh = images_hw[0] // H
        sw = images_hw[1] // W
        ys = jnp.arange(H)[None, :, None] * sh
        xs = jnp.arange(W)[None, None, :] * sw
        pad = (ys >= img_hw[:, 0, None, None]) | (
            xs >= img_hw[:, 1, None, None])
        pos = sine_positional_encoding(pad, num_feats=self.channels // 2,
                                       dtype=top.dtype)
        x = nn.Conv(self.channels, (1, 1), name="encoder_in_proj")(top)
        tokens = x.reshape(B, H * W, self.channels)
        posf = pos.reshape(B, H * W, self.channels)
        pad_flat = pad.reshape(B, H * W)
        for i in range(self.num_encoder_layers):
            # query_key_padding_mask=padding_mask (pixel_decoder.py:230)
            tokens = DETREncoderLayer(
                self.channels, dropout=0.0,
                name=f"encoder_layer{i}")(tokens, posf, deterministic,
                                          key_padding_mask=pad_flat)
        memory = tokens                               # (B, HW, C)
        y = _gn_conv(tokens.reshape(B, H, W, self.channels), self.channels,
                     "encoder_out")
        for i in range(len(feats) - 2, -1, -1):
            lat = nn.Conv(self.channels, (1, 1), use_bias=False,
                          name=f"lateral{i}_conv")(feats[i])
            lat = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                               name=f"lateral{i}_gn")(lat)
            hh, ww = lat.shape[1:3]
            up = jax.image.resize(y, (B, hh, ww, self.channels),
                                  method="nearest")
            y = _gn_conv(lat + up, self.channels, f"output{i}")
        mask_feature = nn.Conv(self.channels, (3, 3),
                               padding=[(1, 1), (1, 1)],
                               name="mask_feature")(y)
        return mask_feature, memory, pad.reshape(B, H * W), posf


class MaskFormer(nn.Module):
    """detectors/maskformer.py: backbone + pixel decoder + query decoder
    + mask-classification heads."""
    num_classes: int = 80     # things (+ stuff when panoptic data is fed)
    depth: int = 50
    frozen_stages: int = 1
    num_queries: int = NUM_QUERIES
    num_decoder_layers: int = 6
    embed_dims: int = 256

    @nn.compact
    def __call__(self, images, img_hw, deterministic: bool = True):
        C = self.embed_dims
        feats = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                       frozen_stages=self.frozen_stages,
                       name="backbone")(images)
        mask_feats, memory, mem_pad, mem_pos = TransformerEncoderPixelDecoder(
            C, name="pixel_decoder")(feats, img_hw, images.shape[1:3],
                                     deterministic)
        B = images.shape[0]
        query_embed = self.param("query_embed",
                                 nn.initializers.normal(1.0),
                                 (self.num_queries, C))
        qp = jnp.broadcast_to(query_embed[None].astype(mask_feats.dtype),
                              (B, self.num_queries, C))
        q = jnp.zeros_like(qp)
        post_norm = nn.LayerNorm(epsilon=1e-5, name="post_norm")
        inter = []
        for i in range(self.num_decoder_layers):
            # key_padding_mask=padding_mask (maskformer_head.py:463)
            q = DETRDecoderLayer(
                C, dropout=0.0,
                name=f"decoder_layer{i}")(q, qp, memory, mem_pos,
                                          deterministic,
                                          key_padding_mask=mem_pad)
            inter.append(post_norm(q))
        hs = jnp.stack(inter, 0)                       # (nl, B, Q, C)

        cls = nn.Dense(self.num_classes + 1, name="cls_embed")(hs)
        m = hs
        for i in range(2):
            m = nn.relu(nn.Dense(C, name=f"mask_embed{i}")(m))
        m = nn.Dense(C, name="mask_embed2")(m)
        masks = jnp.einsum("lbqc,bhwc->lbqhw", m, mask_feats)
        return MaskFormerOutputs(cls, masks, mask_feats)


class MaskFormerLossConfig(NamedTuple):
    num_classes: int = 80
    bg_cls_weight: float = 0.1
    cls_cost_weight: float = 1.0
    mask_cost_weight: float = 20.0
    dice_cost_weight: float = 1.0
    loss_mask_weight: float = 20.0
    loss_dice_weight: float = 1.0
    dice_eps: float = 1.0


def _naive_dice_matrix(pred_sig, tgt, eps: float = 1.0):
    """(Q, HW) x (G, HW) -> (Q, G) naive dice cost (match_costs DiceCost:
    first-power denominators)."""
    inter = pred_sig @ tgt.T                           # (Q, G)
    s_p = pred_sig.sum(-1)[:, None]
    s_t = tgt.sum(-1)[None]
    return 1.0 - (2 * inter + eps) / (s_p + s_t + eps)


def _focal_cost_matrix(pred_logits, tgt, alpha=0.25, gamma=2.0,
                       eps: float = 1e-12):
    """Binary focal mask cost (match_costs FocalLossCost binary_input:
    pos_cost @ tgt + neg_cost @ (1 - tgt), normalized by n_pixels)."""
    p = jax.nn.sigmoid(pred_logits)
    posc = -((1 - p) ** gamma) * alpha * jnp.log(p + eps)
    negc = -(p ** gamma) * (1 - alpha) * jnp.log(1 - p + eps)
    n = pred_logits.shape[-1]
    return (posc @ tgt.T + negc @ (1.0 - tgt.T)) / n


def maskformer_loss(out: MaskFormerOutputs, gt_labels, gt_masks, gt_valid,
                    cfg: MaskFormerLossConfig) -> Dict[str, jnp.ndarray]:
    """Per-decoder-layer mask-classification losses
    (maskformer_head.py loss/loss_single)."""
    NL, B, Q, C1 = out.cls_scores.shape
    C = cfg.num_classes
    G = gt_labels.shape[1]
    Hm, Wm = out.mask_preds.shape[-2:]
    gt_m = gt_masks[:, :, :Hm, :Wm].reshape(B, G, -1).astype(jnp.float32)

    losses = {}
    for layer in range(NL):
        cls_s = out.cls_scores[layer]                  # (B, Q, C+1)
        mask_s = out.mask_preds[layer].reshape(B, Q, -1)

        def assign_one(c, m, gl, gm, gv):
            prob = jax.nn.softmax(c, -1)
            cost_cls = -cfg.cls_cost_weight * prob[:, jnp.clip(gl, 0, C - 1)]
            cost_mask = cfg.mask_cost_weight * _focal_cost_matrix(m, gm)
            cost_dice = cfg.dice_cost_weight * _naive_dice_matrix(
                jax.nn.sigmoid(m), gm, cfg.dice_eps)
            return hungarian_assign(cost_cls + cost_mask + cost_dice,
                                    gv, gl)

        res = jax.vmap(assign_one)(cls_s, mask_s, gt_labels, gt_m,
                                   gt_valid)
        pos = res.pos_mask                             # (B, Q)
        safe = jnp.clip(res.assigned_gt, 0, G - 1)
        labels = jnp.where(
            pos, jnp.take_along_axis(gt_labels, safe,
                                     axis=1).astype(jnp.int32), C)
        # CE with class_weight [1]*C + [bg 0.1]; avg by summed weights
        w = jnp.where(labels == C, cfg.bg_cls_weight, 1.0).reshape(-1)
        logp = jax.nn.log_softmax(cls_s.reshape(-1, C1), -1)
        ce = -jnp.take_along_axis(logp, labels.reshape(-1, 1), -1)[:, 0]
        loss_cls = (ce * w).sum() / jnp.maximum(w.sum(), 1.0)

        num_masks = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
        tgt = jnp.take_along_axis(gt_m, safe[..., None], axis=1)
        posf = pos.astype(jnp.float32)
        p_sig = jax.nn.sigmoid(mask_s)
        inter = (p_sig * tgt).sum(-1)
        dice = 1.0 - (2 * inter + cfg.dice_eps) / (
            p_sig.sum(-1) + tgt.sum(-1) + cfg.dice_eps)
        loss_dice = cfg.loss_dice_weight * (dice * posf).sum() / num_masks
        fl = L.sigmoid_focal_loss(
            mask_s.reshape(-1, 1), tgt.reshape(-1, 1),
            weight=jnp.repeat(posf.reshape(-1), mask_s.shape[-1])[:, None],
            avg_factor=num_masks * Hm * Wm)
        loss_mask = cfg.loss_mask_weight * fl

        pre = "" if layer == NL - 1 else f"d{layer}."
        losses[pre + "loss_cls"] = loss_cls
        losses[pre + "loss_mask"] = loss_mask
        losses[pre + "loss_dice"] = loss_dice
    return losses


def maskformer_decode(out: MaskFormerOutputs, num_classes: int,
                      max_per_img: int = 100, mask_thr: float = 0.5):
    """Instance decode (maskformer_fusion_head.instance_postprocess):
    top-k over Q x C softmax thing scores, mask-foreground rescoring,
    mask-extent boxes + 28x28 box-local resampling (SOLO bridge)."""
    from ..ops.roi_align import roi_align
    cls = out.cls_scores[-1]
    masks = out.mask_preds[-1]
    B, Q = cls.shape[:2]
    Hm, Wm = masks.shape[-2:]
    C = num_classes

    def per_image(c, m):
        scores = jax.nn.softmax(c, -1)[:, :C]          # (Q, C)
        k = min(max_per_img, Q * C)
        top_s, idx = jax.lax.top_k(scores.reshape(-1), k)
        qidx = idx // C
        lbl = (idx % C).astype(jnp.int32)
        ms = jax.nn.sigmoid(m[qidx])                   # (k, Hm, Wm)
        binm = ms > mask_thr
        area = jnp.maximum(binm.reshape(k, -1).sum(-1), 1)
        maskness = (ms * binm).reshape(k, -1).sum(-1) / area
        sc = top_s * maskness
        ys = jnp.arange(Hm, dtype=jnp.float32) * 4.0
        xs = jnp.arange(Wm, dtype=jnp.float32) * 4.0
        rows = binm.any(axis=2)
        cols = binm.any(axis=1)
        big = 1e9
        y1 = jnp.min(jnp.where(rows, ys[None], big), axis=1)
        y2 = jnp.max(jnp.where(rows, ys[None] + 4.0, -big), axis=1)
        x1 = jnp.min(jnp.where(cols, xs[None], big), axis=1)
        x2 = jnp.max(jnp.where(cols, xs[None] + 4.0, -big), axis=1)
        valid = binm.any(axis=(1, 2)) & (sc > 0)
        boxes = jnp.where(valid[:, None],
                          jnp.stack([x1, y1, x2, y2], -1), 0.0)
        m28 = jax.vmap(lambda mm, bb: roi_align(
            mm[..., None], bb[None], out_size=28,
            spatial_scale=0.25)[0, :, :, 0])(ms, boxes)
        return boxes, sc, lbl, valid, m28

    boxes, sc, lb, valid, m28 = jax.vmap(per_image)(cls, masks)
    return dict(bboxes=boxes, scores=sc, labels=lb, valid=valid,
                masks28=m28)


def maskformer_panoptic_fuse(cls_logits: "np.ndarray",
                             mask_logits: "np.ndarray",
                             num_things: int, num_stuff: int,
                             object_mask_thr: float = 0.8,
                             iou_thr: float = 0.8):
    """Host-side panoptic fusion (maskformer_fusion_head.py
    panoptic_postprocess): per-pixel argmax over score-weighted query
    masks, keeping queries whose surviving area covers > iou_thr of
    their full mask; things get fresh instance ids, stuff segments of
    one class merge. Output encoding matches heuristic_fuse
    (cls + instance_id * INSTANCE_OFFSET, void = num_things+num_stuff),
    so the shared PQStat applies.

    cls_logits: (Q, C+1) numpy; mask_logits: (Q, H, W) numpy."""
    import numpy as np

    from .panoptic_fpn import INSTANCE_OFFSET
    C = num_things + num_stuff
    e = np.exp(cls_logits - cls_logits.max(-1, keepdims=True))
    prob = e / e.sum(-1, keepdims=True)
    scores = prob.max(-1)
    labels = prob.argmax(-1)
    masks = 1.0 / (1.0 + np.exp(-mask_logits))
    pan = np.full(mask_logits.shape[-2:], C, np.int64)
    keep = (labels != C) & (scores > object_mask_thr)
    ks = np.where(keep)[0]
    if len(ks) == 0:
        return pan
    prob_masks = scores[ks, None, None] * masks[ks]
    mask_ids = prob_masks.argmax(0)
    instance_id = 1
    for j, q in enumerate(ks):
        lab = int(labels[q])
        full = masks[q] >= 0.5
        binm = (mask_ids == j) & full
        area, orig = binm.sum(), full.sum()
        if area == 0 or orig == 0 or area / orig <= iou_thr:
            continue
        if lab < num_things:
            pan[binm] = lab + instance_id * INSTANCE_OFFSET
            instance_id += 1
        else:
            pan[binm] = lab
    return pan


def append_stuff_gt(gt_labels, gt_masks, gt_valid, gt_semantic,
                    num_things: int, num_stuff: int):
    """Panoptic GT assembly (maskformer_head.preprocess_gt): one extra
    GT row per stuff class present in the image, its mask derived from
    the semantic map (labels [num_things, num_things+num_stuff) on the
    coco_panoptic protocol; 255 = void). Static shapes: always
    ``num_stuff`` extra rows, absent classes carry valid=False."""
    B = gt_labels.shape[0]
    Hm, Wm = gt_masks.shape[-2:]
    sem = gt_semantic[:, :Hm, :Wm]
    sids = num_things + jnp.arange(num_stuff, dtype=jnp.int32)
    smasks = (sem[:, None] == sids[None, :, None, None]).astype(
        gt_masks.dtype)                              # (B, S, Hm, Wm)
    svalid = smasks.sum(axis=(-1, -2)) > 0
    labels = jnp.concatenate(
        [gt_labels, jnp.broadcast_to(sids[None], (B, num_stuff))], 1)
    masks = jnp.concatenate([gt_masks, smasks], 1)
    valid = jnp.concatenate([gt_valid, svalid], 1)
    return labels, masks, valid


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return MaskFormer(num_classes=m.num_classes
                          + (m.num_stuff_classes if m.panoptic else 0),
                          depth=m.depth, frozen_stages=m.frozen_stages,
                          num_queries=m.num_query)

    def losses(model, cfg, **_):
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
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import DetM

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            d = maskformer_decode(out, num_classes=model.num_classes,
                                  max_per_img=max_per_img)
            return DetM(d["bboxes"] / scale_factors[:, None, :],
                        d["scores"], d["labels"], d["valid"],
                        d["masks28"])
        return step

    # with_semantic="panoptic": semantic GT is needed only when the
    # config runs the panoptic recipe (registry.family_data_flag)
    register_family("maskformer", build=build, losses=losses,
                    eval_step=eval_step, with_mask=True,
                    with_semantic="panoptic")


_register()

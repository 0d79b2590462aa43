"""Vanilla Deformable-DETR family: base / iterative box refine / two-stage.

Parity targets (behavior studied from the reference, rebuilt TPU-first):
  * mmdet/models/utils/transformer.py:906-1021 — DeformableDetrTransformer
    two-stage branch (gen_encoder_output_proposals, enc_outputs_class/coord,
    topk proposal queries, pos_trans embedding) and the decoder's per-layer
    reference refinement via reg_branches;
  * mmdet/models/dense_heads/deformable_detr_head.py:318 — per-layer
    (refine) vs shared (base) cls/reg branches, focal cls + L1 + GIoU
    Hungarian losses, class-agnostic encoder-proposal losses;
  * configs/deformable_detr/*.py — the 44.5 / 46.1 / 46.8 AP ladder.

TPU-first notes: static top-k proposal selection (no data-dependent
shapes); the decoder reuses the premap packed-corner cross-attention
(ops/msda.py) — raw memory packed once, per-layer value_proj applied
post-reduction; per-layer refinement is a Python-unrolled loop of 6 static
layers (XLA unrolls it anyway — no scan needed at this depth).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.boxes import bbox_cxcywh_to_xyxy, bbox_xyxy_to_cxcywh
from ..core.matching import detr_match_cost, hungarian_assign
from ..core.postprocess import filter_scores_and_topk
from .channel_mapper import ChannelMapper
from .gfl_detr_head import bias_init_with_prob
from .positional import sine_positional_encoding
from .resnet import ResNet
from .transformer import (DecoderLayer, EncoderLayer,
                          encoder_reference_points, inverse_sigmoid,
                          level_masks_and_ratios)
from ..ops.msda import pack_corners_raw


class DDETRHeadOutputs(NamedTuple):
    """cls_scores: (nl, B, Q, C) logits; bbox_preds: (nl, B, Q, 4) sigmoid
    cxcywh; enc_cls_scores/enc_bbox_preds: (B, S, C)/(B, S, 4) for the
    two-stage proposal head, else None; enc_token_valid: (B, S) tokens with
    in-range proposals (two-stage), else None."""
    cls_scores: jnp.ndarray
    bbox_preds: jnp.ndarray
    enc_cls_scores: Optional[jnp.ndarray]
    enc_bbox_preds: Optional[jnp.ndarray]
    enc_token_valid: Optional[jnp.ndarray]


class DDETROutputs(NamedTuple):
    head: DDETRHeadOutputs
    neck_feats: Tuple[jnp.ndarray, ...]


def proposal_pos_embed(proposals: jnp.ndarray, num_pos_feats: int = 128,
                       temperature: float = 10000.0) -> jnp.ndarray:
    """(B, Q, 4) normalized boxes -> (B, Q, 4*num_pos_feats) sine embedding
    (reference get_proposal_pos_embed, transformer.py:906-923)."""
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos = proposals * scale
    pos = pos[..., None] / dim_t                    # (B, Q, 4, F)
    pos = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])],
                    axis=-1).reshape(pos.shape[:-1] + (num_pos_feats,))
    return pos.reshape(pos.shape[0], pos.shape[1], -1)


def gen_encoder_output_proposals(memory, mask_flat, spatial_shapes,
                                 valid_wh):
    """Per-token anchor proposals in logit space + token validity.

    Reference gen_encoder_output_proposals (transformer.py:925-978): level
    l's grid centers normalized by the VALID extent, wh = 0.05 * 2^l; a
    token's proposal is valid iff all 4 sigmoided coords are in
    (0.01, 0.99). Returns (proposals_unact (B, S, 4), valid (B, S))."""
    B = memory.shape[0]
    props, valids = [], []
    for lvl, (h, w) in enumerate(spatial_shapes):
        vw = valid_wh[:, lvl, 0][:, None, None]     # (B, 1, 1)
        vh = valid_wh[:, lvl, 1][:, None, None]
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)[None, :, None]
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, None, :]
        grid = jnp.stack(
            [jnp.broadcast_to(xs / vw, (B, h, w)),
             jnp.broadcast_to(ys / vh, (B, h, w))], -1)      # (B, h, w, 2)
        wh = jnp.full((B, h, w, 2), 0.05 * (2.0 ** lvl), jnp.float32)
        p = jnp.concatenate([grid, wh], -1).reshape(B, h * w, 4)
        props.append(p)
    proposals = jnp.concatenate(props, 1)                    # (B, S, 4)
    valid = ((proposals > 0.01) & (proposals < 0.99)).all(-1)
    valid = valid & ~mask_flat
    # inverse-sigmoid to logit space; invalid rows get +inf in the
    # reference — use a large constant (masked out of every consumer)
    unact = jnp.log(proposals / (1 - jnp.clip(proposals, None, 0.999999)))
    unact = jnp.where(valid[..., None], unact, 1e6)
    return unact, valid


class DeformableDETRHead(nn.Module):
    """Encoder/decoder + per-layer or shared cls/reg branches."""
    num_classes: int = 80
    num_query: int = 300
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    feedforward_channels: int = 1024
    dropout: float = 0.1
    with_box_refine: bool = False
    as_two_stage: bool = False
    remat: bool = True

    @nn.compact
    def __call__(self, mlvl_feats, img_hw, batch_input_shape,
                 deterministic: bool = True) -> DDETRHeadOutputs:
        B = mlvl_feats[0].shape[0]
        C = self.embed_dims
        dtype = mlvl_feats[0].dtype
        spatial_shapes = tuple((f.shape[1], f.shape[2]) for f in mlvl_feats)
        masks, valid_ratios = level_masks_and_ratios(
            img_hw, batch_input_shape, spatial_shapes)
        level_wh = jnp.array([[w, h] for (h, w) in spatial_shapes],
                             jnp.float32)
        valid_wh = valid_ratios * level_wh[None]
        valid_ratios = valid_ratios.astype(dtype)

        level_embeds = self.param("level_embeds",
                                  nn.initializers.normal(1.0),
                                  (self.num_levels, C))
        feat_flat, mask_flat, pos_flat = [], [], []
        for lvl, (feat, mask) in enumerate(zip(mlvl_feats, masks)):
            pos = sine_positional_encoding(mask, num_feats=C // 2,
                                           dtype=dtype)
            h, w = spatial_shapes[lvl]
            feat_flat.append(feat.reshape(B, h * w, C))
            mask_flat.append(mask.reshape(B, h * w))
            pos_flat.append(pos.reshape(B, h * w, C)
                            + level_embeds[lvl].astype(dtype))
        feat_flat = jnp.concatenate(feat_flat, 1)
        mask_flat = jnp.concatenate(mask_flat, 1)
        pos_flat = jnp.concatenate(pos_flat, 1)

        enc_layer_cls = (nn.remat(EncoderLayer, static_argnums=(4, 6))
                         if self.remat else EncoderLayer)
        enc_refs = encoder_reference_points(spatial_shapes, valid_ratios,
                                            dtype)
        x = feat_flat
        for i in range(self.num_encoder_layers):
            x = enc_layer_cls(C, self.num_heads, self.num_levels,
                              self.num_points, self.feedforward_channels,
                              self.dropout, name=f"encoder_layer{i}")(
                x, pos_flat, enc_refs, spatial_shapes, mask_flat,
                deterministic)
        memory = x

        # branches: independent per prediction layer when refining,
        # otherwise ONE set shared by every layer (reference :170-178).
        # Module instances are constructed once and re-called so shared
        # layers truly share parameters.
        num_pred = (self.num_decoder_layers + 1 if self.as_two_stage
                    else self.num_decoder_layers)
        n_sets = num_pred if self.with_box_refine else 1
        _cls = [nn.Dense(self.num_classes,
                         kernel_init=nn.initializers.xavier_uniform(),
                         bias_init=nn.initializers.constant(
                             bias_init_with_prob(0.01)),
                         name=f"cls_branch{i}") for i in range(n_sets)]
        def _reg_bias(i):
            # reference init_weights: reg out zero-init; branch 0's wh bias
            # = -2 (small boxes) EXCEPT in two-stage mode
            if i == 0 and not self.as_two_stage:
                return lambda key, shape, dtype=jnp.float32: \
                    jnp.zeros(shape, dtype).at[2:].set(-2.0)
            return nn.initializers.zeros

        _reg = [tuple(nn.Dense(
            C, kernel_init=nn.initializers.xavier_uniform(),
            name=f"reg{i}_fc{j}") for j in range(2))
            + (nn.Dense(4, kernel_init=nn.initializers.zeros,
                        bias_init=_reg_bias(i),
                        name=f"reg{i}_out"),) for i in range(n_sets)]

        def cls_branch(i):
            return _cls[i if self.with_box_refine else 0]

        def reg_branch(i, x):
            fc0, fc1, out = _reg[i if self.with_box_refine else 0]
            return out(nn.relu(fc1(nn.relu(fc0(x)))))

        enc_cls = enc_coord = enc_valid = None
        if self.as_two_stage:
            # proposal head on the (masked, projected) encoder memory
            proposals_unact, enc_valid = gen_encoder_output_proposals(
                memory, mask_flat, spatial_shapes, valid_wh)
            om = jnp.where((mask_flat | ~enc_valid)[..., None], 0.0, memory)
            om = nn.Dense(C, kernel_init=nn.initializers.xavier_uniform(),
                          name="enc_output")(om)
            om = nn.LayerNorm(epsilon=1e-5, name="enc_output_norm")(om)
            enc_cls = cls_branch(num_pred - 1)(om)           # (B, S, C)
            enc_coord_unact = (reg_branch(num_pred - 1, om)
                               + proposals_unact)
            enc_coord = jax.nn.sigmoid(enc_coord_unact)
            # top num_query proposals by class-0 logit (reference :1001)
            score0 = jnp.where(enc_valid, enc_cls[..., 0], -1e9)
            _, topk = jax.lax.top_k(score0, self.num_query)  # (B, Q)
            topk_unact = jax.lax.stop_gradient(jnp.take_along_axis(
                enc_coord_unact, topk[..., None], axis=1))   # (B, Q, 4)
            reference_points = jax.nn.sigmoid(topk_unact)
            pe = proposal_pos_embed(reference_points)        # (B, Q, 2C)
            pt = nn.Dense(2 * C,
                          kernel_init=nn.initializers.xavier_uniform(),
                          name="pos_trans_fc")(pe)
            pt = nn.LayerNorm(epsilon=1e-5, name="pos_trans_norm")(pt)
            query_pos, query = jnp.split(pt, 2, axis=-1)
        else:
            query_embedding = self.param(
                "query_embedding", nn.initializers.normal(1.0),
                (self.num_query, 2 * C))
            query_pos, query = jnp.split(query_embedding, 2, axis=1)
            query_pos = jnp.broadcast_to(query_pos[None],
                                         (B,) + query_pos.shape)
            query = jnp.broadcast_to(query[None], (B,) + query.shape)
            ref_linear = nn.Dense(
                2, kernel_init=nn.initializers.variance_scaling(
                    1.0, "fan_avg", "uniform"),
                name="reference_points")
            reference_points = jax.nn.sigmoid(ref_linear(query_pos))

        init_reference = reference_points
        dec_layer_cls = (nn.remat(DecoderLayer, static_argnums=(5, 7))
                         if self.remat else DecoderLayer)
        # premap decoder tables measured slower on chip at flagship shapes
        # (PERF.md round 3) — same opt-in knob as the GFL transformer
        import os
        if os.environ.get("DSKD_PREMAP") == "1":
            packed_tables = pack_corners_raw(memory, spatial_shapes)
            dec_memory, dec_mask = None, None
            dec_valid_wh = valid_wh
        else:
            packed_tables, dec_valid_wh = None, None
            dec_memory, dec_mask = memory, mask_flat

        inter_states, inter_refs = [], []
        for i in range(self.num_decoder_layers):
            if reference_points.shape[-1] == 4:
                ref_input = (reference_points[:, :, None, :]
                             * jnp.concatenate([valid_ratios] * 2, -1)[
                                 :, None, :, :])
            else:
                ref_input = (reference_points[:, :, None, :]
                             * valid_ratios[:, None, :, :])
            query = dec_layer_cls(C, self.num_heads, self.num_levels,
                                  self.num_points,
                                  self.feedforward_channels, self.dropout,
                                  name=f"decoder_layer{i}")(
                query, query_pos, dec_memory, ref_input, spatial_shapes,
                dec_mask, deterministic, packed_tables, dec_valid_wh)
            inter_states.append(query)
            if self.with_box_refine:
                # per-layer refinement (reference decoder :1024-1045)
                tmp = reg_branch(i, query)
                if reference_points.shape[-1] == 4:
                    new_ref = jax.nn.sigmoid(
                        tmp + inverse_sigmoid(reference_points))
                else:
                    new_ref = jax.nn.sigmoid(jnp.concatenate(
                        [tmp[..., :2]
                         + inverse_sigmoid(reference_points),
                         tmp[..., 2:]], -1))
                reference_points = jax.lax.stop_gradient(new_ref)
            inter_refs.append(reference_points)

        # per-layer decode: layer l uses the PRE-layer reference
        cls_scores, bbox_preds = [], []
        for i, hs_i in enumerate(inter_states):
            ref = init_reference if i == 0 else inter_refs[i - 1]
            tmp = reg_branch(i, hs_i)
            if ref.shape[-1] == 4:
                tmp = tmp + inverse_sigmoid(ref)
            else:
                tmp = jnp.concatenate(
                    [tmp[..., :2] + inverse_sigmoid(ref), tmp[..., 2:]],
                    -1)
            cls_scores.append(cls_branch(i)(hs_i))
            bbox_preds.append(jax.nn.sigmoid(tmp))
        return DDETRHeadOutputs(jnp.stack(cls_scores, 0),
                                jnp.stack(bbox_preds, 0),
                                enc_cls, enc_coord, enc_valid)


class DeformableDETR(nn.Module):
    """ResNet + ChannelMapper + DeformableDETRHead (zoo family)."""
    num_classes: int = 80
    num_query: int = 300
    depth: int = 50
    frozen_stages: int = 1
    embed_dims: int = 256
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_levels: int = 4
    dropout: float = 0.1
    with_box_refine: bool = False
    as_two_stage: bool = False
    remat: bool = True

    @nn.compact
    def __call__(self, images, img_hw, deterministic: bool = True):
        batch_input_shape = (images.shape[1], images.shape[2])
        feats = ResNet(depth=self.depth, out_indices=(1, 2, 3),
                       frozen_stages=self.frozen_stages,
                       name="backbone")(images)
        neck_feats = ChannelMapper(out_channels=self.embed_dims,
                                   num_outs=self.num_levels,
                                   name="neck")(feats)
        head = DeformableDETRHead(
            num_classes=self.num_classes, num_query=self.num_query,
            embed_dims=self.embed_dims,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            num_levels=self.num_levels, dropout=self.dropout,
            with_box_refine=self.with_box_refine,
            as_two_stage=self.as_two_stage, remat=self.remat,
            name="bbox_head")(neck_feats, img_hw, batch_input_shape,
                              deterministic=deterministic)
        return DDETROutputs(head, neck_feats)


class DDETRLossConfig(NamedTuple):
    num_classes: int = 80
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 2.0
    loss_bbox_weight: float = 5.0
    loss_iou_weight: float = 2.0


def _layer_loss(cls_s, bbox_p, gt_bboxes, gt_labels, gt_valid, img_hw,
                cfg: DDETRLossConfig):
    """One prediction layer: focal-cost Hungarian + focal/L1/GIoU."""
    B, Q, C = cls_s.shape
    G = gt_bboxes.shape[1]

    def assign_one(c, b, gb, gl, gv, hw):
        cost = detr_match_cost(c, b, gb, gl, hw, cls_cost="focal",
                               cls_weight=2.0, reg_weight=5.0,
                               iou_weight=2.0)
        return hungarian_assign(cost, gv, gl)

    res = jax.vmap(assign_one)(cls_s, bbox_p, gt_bboxes, gt_labels,
                               gt_valid, img_hw)
    safe = jnp.clip(res.assigned_gt, 0, G - 1)
    num_pos = jnp.maximum(res.pos_mask.sum().astype(jnp.float32), 1.0)

    labels_q = jnp.where(
        res.pos_mask,
        jnp.take_along_axis(gt_labels, safe, axis=1).astype(jnp.int32), C)
    onehot = jax.nn.one_hot(labels_q, C + 1)[..., :C]
    loss_cls = cfg.loss_cls_weight * L.sigmoid_focal_loss(
        cls_s.reshape(-1, C), onehot.reshape(-1, C), avg_factor=num_pos,
        gamma=cfg.focal_gamma, alpha=cfg.focal_alpha)

    h = img_hw[:, 0].astype(jnp.float32)
    w = img_hw[:, 1].astype(jnp.float32)
    factor = jnp.stack([w, h, w, h], -1)[:, None]
    tgt_xyxy_n = jnp.take_along_axis(gt_bboxes, safe[..., None],
                                     axis=1) / factor
    tgt_cxcywh = bbox_xyxy_to_cxcywh(tgt_xyxy_n)
    wpos = res.pos_mask.astype(jnp.float32)[..., None]
    loss_bbox = cfg.loss_bbox_weight * L.l1_loss(
        bbox_p.reshape(-1, 4), tgt_cxcywh.reshape(-1, 4),
        weight=jnp.repeat(wpos, 4, -1).reshape(-1, 4), avg_factor=num_pos)
    pred_xyxy = bbox_cxcywh_to_xyxy(bbox_p) * factor
    loss_iou = cfg.loss_iou_weight * L.giou_loss(
        pred_xyxy.reshape(-1, 4), (tgt_xyxy_n * factor).reshape(-1, 4),
        weight=wpos.reshape(-1), avg_factor=num_pos)
    return loss_cls, loss_bbox, loss_iou


def deformable_detr_loss(out: DDETRHeadOutputs, gt_bboxes, gt_labels,
                         gt_valid, img_hw, cfg: DDETRLossConfig):
    """Per-layer aux losses + class-agnostic encoder-proposal losses
    (deformable_detr_head.py loss)."""
    nl = out.cls_scores.shape[0]
    losses = {}
    for lyr in range(nl):
        lc, lb, li = _layer_loss(out.cls_scores[lyr], out.bbox_preds[lyr],
                                 gt_bboxes, gt_labels, gt_valid, img_hw,
                                 cfg)
        prefix = "" if lyr == nl - 1 else f"d{lyr}."
        losses[prefix + "loss_cls"] = lc
        losses[prefix + "loss_bbox"] = lb
        losses[prefix + "loss_iou"] = li
    if out.enc_cls_scores is not None:
        # encoder proposals train class-agnostically (binary labels = 0)
        lc, lb, li = _layer_loss(out.enc_cls_scores, out.enc_bbox_preds,
                                 gt_bboxes, jnp.zeros_like(gt_labels),
                                 gt_valid, img_hw, cfg)
        losses["enc.loss_cls"] = lc
        losses["enc.loss_bbox"] = lb
        losses["enc.loss_iou"] = li
    return losses


def deformable_detr_get_bboxes(out: DDETRHeadOutputs, img_hw,
                               score_thr: float = 0.0,
                               max_per_img: int = 100, scale_factor=None,
                               rescale: bool = False):
    """Sigmoid decode: flat top-k over (Q, C) pairs (no NMS)."""
    cls = out.cls_scores[-1]
    box = out.bbox_preds[-1]
    B, Q, C = cls.shape
    probs = jax.nn.sigmoid(cls)

    def per_image(p, b, hw, sf):
        top = filter_scores_and_topk(p, score_thr, max_per_img)
        h, w = hw[0].astype(jnp.float32), hw[1].astype(jnp.float32)
        factor = jnp.stack([w, h, w, h])
        xyxy = bbox_cxcywh_to_xyxy(b[top.keep_idxs]) * factor
        xyxy = jnp.stack([
            jnp.clip(xyxy[:, 0], 0, w), jnp.clip(xyxy[:, 1], 0, h),
            jnp.clip(xyxy[:, 2], 0, w), jnp.clip(xyxy[:, 3], 0, h)], -1)
        if rescale and sf is not None:
            xyxy = xyxy / sf[None]
        return xyxy, top.scores, top.labels, top.valid

    if scale_factor is None:
        scale_factor = jnp.ones((B, 4), jnp.float32)
    nb, ns, nlb, valid = jax.vmap(per_image)(probs, box, img_hw,
                                             scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nlb, valid=valid)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return DeformableDETR(
            num_classes=m.num_classes, num_query=m.num_query,
            depth=m.depth, frozen_stages=m.frozen_stages,
            embed_dims=m.embed_dims,
            num_encoder_layers=m.num_encoder_layers,
            num_decoder_layers=m.num_decoder_layers,
            num_levels=m.num_levels, dropout=m.dropout,
            with_box_refine=m.with_box_refine,
            as_two_stage=m.as_two_stage, remat=m.remat)

    def losses(model, cfg, *, use_dropout=True, **_):
        det_cfg = DDETRLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(
                variables, batch.images, batch.img_hw,
                deterministic=not use_dropout,
                rngs={"dropout": rng} if use_dropout else None)
            return deformable_detr_loss(
                out.head, batch.gt_bboxes, batch.gt_labels, batch.gt_valid,
                batch.img_hw, det_cfg), None
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            d = deformable_detr_get_bboxes(
                out.head, img_hw, score_thr=score_thr,
                max_per_img=max_per_img, scale_factor=scale_factors,
                rescale=True)
            from ..utils.det import Det
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("deformable_detr", build=build, losses=losses,
                    eval_step=eval_step)


_register()

"""Mask2Former (parity: mmdet detectors/mask2former.py +
dense_heads/mask2former_head.py + plugins/msdeformattn_pixel_decoder.py;
configs/mask2former/mask2former_r50_lsj_8x2_50e_coco.py,
instance mask AP 44.8 / PQ 51.9).

Masked-attention mask classification:
  * pixel decoder: the /8, /16, /32 backbone levels (projected, with
    learned level embeddings + sine PE) run a 6-layer multi-scale
    DEFORMABLE encoder (the framework's MSDeformAttention, 3 levels,
    4 points); the /4 level is fused FPN-style on top and a 1x1 conv
    emits the stride-4 mask features;
  * transformer decoder: 100 queries with learned content (query_feat)
    AND positional (query_embed) embeddings run 9 layers cycling over
    the 3 encoder scales, operation order (cross_attn, norm, self_attn,
    norm, ffn, norm); the cross attention is MASKED by the previous
    prediction - attention is allowed only where sigmoid(mask) >= 0.5
    at the target scale, with an all-background fallback to full
    attention (mask2former_head.py:406-408); a prediction is emitted
    from the initial query features too (num_layers + 1 outputs);
  * losses: per-layer Hungarian on [softmax class cost (w2), per-point
    binary CE cost (w5), naive dice cost (w5, eps 1)] over K uniformly
    random points shared between pred and GT; then CE (bg weight 0.1,
    w2), point-sampled BCE (w5) and naive dice (w5) over
    uncertainty-importance-sampled points (PointRend's
    get_uncertain_point_coords_with_randomness, class-agnostic).

TPU-native notes: padded static query/GT sets with validity; point
counts are static; the attention mask enters flax attention as an
additive-allowed boolean (flax True = attend, torch True = suppress);
the pixel decoder's level input projections are plain 1x1 convs where
the reference wraps them in GN (documented deviation — the encoder
layers immediately LayerNorm the tokens).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.matching import hungarian_assign
from ..ops.point_sample import point_sample
from .maskformer import _gn_conv, maskformer_decode  # noqa: F401
from .positional import sine_positional_encoding
from .resnet import ResNet
from .transformer import FFN, EncoderLayer, MultiheadAttention

NUM_QUERIES = 100


class Mask2FormerOutputs(NamedTuple):
    cls_scores: jnp.ndarray   # (nl+1, B, Q, C+1)
    mask_preds: jnp.ndarray   # (nl+1, B, Q, H/4, W/4)
    mask_feats: jnp.ndarray


class MSDeformAttnPixelDecoder(nn.Module):
    """plugins/msdeformattn_pixel_decoder.py: deformable encoder over
    the 3 coarsest levels + FPN fuse of the /4 level."""
    channels: int = 256
    num_encoder_layers: int = 6
    num_points: int = 4

    @nn.compact
    def __call__(self, feats, deterministic: bool = True):
        B = feats[0].shape[0]
        C = self.channels
        # encoder levels: /32, /16, /8 (low -> high resolution)
        enc_feats = [feats[3], feats[2], feats[1]]
        level_embed = self.param("level_embed",
                                 nn.initializers.normal(1.0), (3, C))
        tokens, poss, shapes = [], [], []
        for i, f in enumerate(enc_feats):
            h, w = f.shape[1:3]
            x = nn.Conv(C, (1, 1), name=f"input_conv{i}")(f)
            pad = jnp.zeros((B, h, w), bool)
            pe = sine_positional_encoding(pad, num_feats=C // 2,
                                          dtype=x.dtype)
            tokens.append(x.reshape(B, h * w, C))
            poss.append((pe + level_embed[i][None, None, None]).reshape(
                B, h * w, C))
            shapes.append((h, w))
        x = jnp.concatenate(tokens, 1)
        pos = jnp.concatenate(poss, 1)
        # uniform grid reference points, all-valid ratios
        refs = []
        for (h, w) in shapes:
            ry = (jnp.arange(h, dtype=x.dtype) + 0.5) / h
            rx = (jnp.arange(w, dtype=x.dtype) + 0.5) / w
            g = jnp.stack(jnp.meshgrid(rx, ry), -1).reshape(-1, 2)
            refs.append(g)
        ref = jnp.concatenate(refs, 0)[None, :, None]
        ref = jnp.broadcast_to(ref, (B, ref.shape[1], 3, 2))
        for i in range(self.num_encoder_layers):
            x = EncoderLayer(C, num_levels=3, num_points=self.num_points,
                             feedforward_channels=1024, dropout=0.0,
                             name=f"encoder_layer{i}")(
                x, pos, ref, shapes, None, deterministic)
        # split back (low -> high res) as TOKENS for the query decoder
        outs = []
        start = 0
        for (h, w) in shapes:
            outs.append(x[:, start:start + h * w])   # (B, h*w, C)
            start += h * w
        # fuse the /4 level FPN-style from the /8 encoder output map
        h8, w8 = shapes[-1]
        top = outs[-1].reshape(B, h8, w8, C)
        lat = nn.Conv(C, (1, 1), use_bias=False, name="lateral0_conv")(
            feats[0])
        lat = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                           name="lateral0_gn")(lat)
        hh, ww = lat.shape[1:3]
        up = jax.image.resize(top, (B, hh, ww, C), method="bilinear")
        y = _gn_conv(lat + up, C, "output0")
        mask_feature = nn.Conv(C, (1, 1), name="mask_feature")(y)
        return mask_feature, outs, poss, shapes


class MaskedCrossAttention(nn.Module):
    """Standard MHA whose attention is restricted to the foreground of
    the previous layer's mask (flax mask: True = MAY attend)."""
    embed_dims: int = 256
    num_heads: int = 8

    @nn.compact
    def __call__(self, query, key, query_pos, key_pos, allow,
                 deterministic: bool = True):
        identity = query
        q = query + query_pos
        k = key + key_pos
        out = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.embed_dims,
            out_features=self.embed_dims,
            kernel_init=nn.initializers.xavier_uniform(),
            deterministic=deterministic, name="attn")(
            q, k, key, mask=allow[:, None])     # (B, 1, Q, S)
        return identity + out


class Mask2Former(nn.Module):
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = 1
    num_queries: int = NUM_QUERIES
    num_decoder_layers: int = 9
    embed_dims: int = 256

    @nn.compact
    def __call__(self, images, img_hw, deterministic: bool = True):
        C = self.embed_dims
        feats = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                       frozen_stages=self.frozen_stages,
                       name="backbone")(images)
        mask_feats, memories, mem_poss, shapes = MSDeformAttnPixelDecoder(
            C, name="pixel_decoder")(feats, deterministic)
        B = images.shape[0]
        Q = self.num_queries
        query_feat = self.param("query_feat", nn.initializers.normal(1.0),
                                (Q, C))
        query_embed = self.param("query_embed",
                                 nn.initializers.normal(1.0), (Q, C))
        q = jnp.broadcast_to(query_feat[None].astype(mask_feats.dtype),
                             (B, Q, C))
        qp = jnp.broadcast_to(query_embed[None].astype(mask_feats.dtype),
                              (B, Q, C))

        post_norm = nn.LayerNorm(epsilon=1e-5, name="post_norm")
        cls_embed = nn.Dense(self.num_classes + 1, name="cls_embed")
        mask_mlp = [nn.Dense(C, name=f"mask_embed{i}") for i in range(3)]

        def forward_head(qf, target_hw):
            x = post_norm(qf)
            cls = cls_embed(x)
            m = x
            for i in range(2):
                m = nn.relu(mask_mlp[i](m))
            m = mask_mlp[2](m)
            mask = jnp.einsum("bqc,bhwc->bqhw", m, mask_feats)
            ht, wt = target_hw
            low = jax.image.resize(mask, (B, Q, ht, wt), method="bilinear")
            allow = jax.nn.sigmoid(low).reshape(B, Q, ht * wt) >= 0.5
            # all-background fallback: attend everywhere
            allow = jnp.where(allow.any(-1, keepdims=True), allow, True)
            return cls, mask, jax.lax.stop_gradient(allow)

        all_cls, all_masks = [], []
        cls, mask, allow = forward_head(q, shapes[0])
        all_cls.append(cls)
        all_masks.append(mask)
        for i in range(self.num_decoder_layers):
            lvl = i % 3
            q = MaskedCrossAttention(C, name=f"layer{i}_cross_attn")(
                q, memories[lvl], qp, mem_poss[lvl], allow, deterministic)
            q = nn.LayerNorm(epsilon=1e-5, name=f"layer{i}_norm1")(q)
            q = MultiheadAttention(C, dropout=0.0,
                                   name=f"layer{i}_self_attn")(
                q, q, q, query_pos=qp, key_pos=qp,
                deterministic=deterministic)
            q = nn.LayerNorm(epsilon=1e-5, name=f"layer{i}_norm2")(q)
            q = FFN(C, 2048, 0.0, name=f"layer{i}_ffn")(
                q, deterministic=deterministic)
            q = nn.LayerNorm(epsilon=1e-5, name=f"layer{i}_norm3")(q)
            cls, mask, allow = forward_head(q, shapes[(i + 1) % 3])
            all_cls.append(cls)
            all_masks.append(mask)
        return Mask2FormerOutputs(jnp.stack(all_cls, 0),
                                  jnp.stack(all_masks, 0), mask_feats)


class Mask2FormerLossConfig(NamedTuple):
    num_classes: int = 80
    bg_cls_weight: float = 0.1
    loss_cls_weight: float = 2.0
    loss_mask_weight: float = 5.0
    loss_dice_weight: float = 5.0
    cls_cost_weight: float = 2.0
    mask_cost_weight: float = 5.0
    dice_cost_weight: float = 5.0
    dice_eps: float = 1.0
    num_points: int = 12544
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75


def _bce_cost_matrix(pred_logits, tgt):
    """(Q, P) logits x (G, P) binary -> (Q, G) mean-BCE cost
    (match_costs CrossEntropyLossCost binary form)."""
    pos = jax.nn.softplus(-pred_logits)          # -log sigmoid
    neg = jax.nn.softplus(pred_logits)           # -log(1 - sigmoid)
    P = pred_logits.shape[-1]
    return (pos @ tgt.T + neg @ (1.0 - tgt.T)) / P


def _uncertain_points(rng, mask_logits, num_points, oversample, importance):
    """Class-agnostic get_uncertain_point_coords_with_randomness over
    (M, H, W) logits -> (M, num_points, 2)."""
    M = mask_logits.shape[0]
    n_sampled = int(num_points * oversample)
    n_unc = int(importance * num_points)
    r1, r2 = jax.random.split(rng)
    pts = jax.random.uniform(r1, (M, n_sampled, 2))
    logits = point_sample(mask_logits[..., None], pts)[..., 0]
    unc = -jnp.abs(logits)
    top = jax.lax.top_k(unc, n_unc)[1]
    chosen = jnp.take_along_axis(pts, top[..., None], axis=1)
    fresh = jax.random.uniform(r2, (M, num_points - n_unc, 2))
    return jnp.concatenate([chosen, fresh], axis=1)


def mask2former_loss(out: Mask2FormerOutputs, gt_labels, gt_masks,
                     gt_valid, rng, cfg: Mask2FormerLossConfig
                     ) -> Dict[str, jnp.ndarray]:
    """Per-layer point-sampled mask-classification losses
    (mask2former_head.py loss_single)."""
    NL, B, Q = out.cls_scores.shape[:3]
    C = cfg.num_classes
    G = gt_labels.shape[1]
    Hm, Wm = out.mask_preds.shape[-2:]
    gt_hw = gt_masks.shape[-2:]
    K = cfg.num_points

    losses = {}
    for layer in range(NL):
        lrng = jax.random.fold_in(rng, layer)
        cls_s = out.cls_scores[layer]
        mask_s = out.mask_preds[layer]               # (B, Q, Hm, Wm)

        # ---- assignment on K shared uniform points ----
        def assign_one(arng, c, m, gl, gm, gv):
            pts = jax.random.uniform(arng, (1, K, 2))
            pred_pts = point_sample(
                m[..., None], jnp.broadcast_to(pts, (Q, K, 2)))[..., 0]
            tgt_pts = point_sample(
                gm[..., None].astype(jnp.float32),
                jnp.broadcast_to(pts, (G, K, 2)))[..., 0]
            prob = jax.nn.softmax(c, -1)
            cost_cls = -cfg.cls_cost_weight * prob[:, jnp.clip(gl, 0, C - 1)]
            cost_mask = cfg.mask_cost_weight * _bce_cost_matrix(pred_pts,
                                                                tgt_pts)
            pred_sig = jax.nn.sigmoid(pred_pts)
            inter = pred_sig @ tgt_pts.T
            dice = 1.0 - (2 * inter + cfg.dice_eps) / (
                pred_sig.sum(-1)[:, None] + tgt_pts.sum(-1)[None]
                + cfg.dice_eps)
            return hungarian_assign(
                cost_cls + cost_mask + cfg.dice_cost_weight * dice, gv, gl)

        arngs = jax.random.split(jax.random.fold_in(lrng, 0), B)
        res = jax.vmap(assign_one)(arngs, cls_s, mask_s, gt_labels,
                                   gt_masks, gt_valid)
        pos = res.pos_mask
        safe = jnp.clip(res.assigned_gt, 0, G - 1)
        labels = jnp.where(
            pos, jnp.take_along_axis(gt_labels, safe,
                                     axis=1).astype(jnp.int32), C)
        w = jnp.where(labels == C, cfg.bg_cls_weight, 1.0).reshape(-1)
        logp = jax.nn.log_softmax(cls_s.reshape(-1, C + 1), -1)
        ce = -jnp.take_along_axis(logp, labels.reshape(-1, 1), -1)[:, 0]
        loss_cls = cfg.loss_cls_weight * (ce * w).sum() / jnp.maximum(
            w.sum(), 1.0)

        # ---- point-sampled mask + dice on the matched pairs ----
        num_masks = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
        mflat = mask_s.reshape(B * Q, Hm, Wm)
        pts = _uncertain_points(jax.random.fold_in(lrng, 1),
                                jax.lax.stop_gradient(mflat), K,
                                cfg.oversample_ratio,
                                cfg.importance_sample_ratio)
        pred_pts = point_sample(mflat[..., None], pts)[..., 0]
        tgt_sel = jnp.take_along_axis(
            gt_masks, safe[..., None, None], axis=1).reshape(
            B * Q, gt_hw[0], gt_hw[1])
        tgt_pts = point_sample(tgt_sel[..., None].astype(jnp.float32),
                               pts)[..., 0]
        posf = pos.reshape(-1).astype(jnp.float32)
        p_sig = jax.nn.sigmoid(pred_pts)
        inter = (p_sig * tgt_pts).sum(-1)
        dice = 1.0 - (2 * inter + cfg.dice_eps) / (
            p_sig.sum(-1) + tgt_pts.sum(-1) + cfg.dice_eps)
        loss_dice = cfg.loss_dice_weight * (dice * posf).sum() / num_masks
        bce = (jax.nn.softplus(-pred_pts) * tgt_pts
               + jax.nn.softplus(pred_pts) * (1.0 - tgt_pts))
        loss_mask = cfg.loss_mask_weight * (
            bce.sum(-1) * posf).sum() / (num_masks * K)

        pre = "" if layer == NL - 1 else f"d{layer}."
        losses[pre + "loss_cls"] = loss_cls
        losses[pre + "loss_mask"] = loss_mask
        losses[pre + "loss_dice"] = loss_dice
    return losses


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return Mask2Former(num_classes=m.num_classes
                           + (m.num_stuff_classes if m.panoptic else 0),
                           depth=m.depth, frozen_stages=m.frozen_stages,
                           num_queries=m.num_query)

    def losses(model, cfg, **_):
        from .maskformer import append_stuff_gt
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
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import DetM
        from .maskformer import maskformer_decode

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

    register_family("mask2former", build=build, losses=losses,
                    eval_step=eval_step, with_mask=True,
                    with_semantic="panoptic")


_register()

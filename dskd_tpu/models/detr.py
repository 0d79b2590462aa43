"""Vanilla DETR (parity: mmdet detr.py + detr_head.py + the fork's
DETR_il teacher protocol, detectors/detr_il.py).

ResNet C5 -> 1x1 input proj -> 6-layer full-attention encoder -> 6-layer
decoder (100 queries, intermediate outputs) -> softmax classifier over C+1
with 0.1 background weight + 2-FC regression MLP -> sigmoid cxcywh.
Hungarian matching with ClassificationCost(1) + L1(5) + GIoU(2).

Incremental (DETR_il, detectors/detr_il.py:35-683): the same frozen-teacher
protocol as the flagship — out_teacher decodes the teacher's detections
(softmax-head top-k with keep-ids, :116-154), hard distillation merges them
into the GT ahead of Hungarian matching, soft distillation KL-divs the
student's logits against the teacher's at the teacher's kept query ids, and
kldv feature distillation matches the encoder memory. Shapes are static:
teacher detections are fixed-size (B, K) arrays with a validity mask.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.boxes import bbox_cxcywh_to_xyxy, bbox_overlaps, bbox_xyxy_to_cxcywh
from ..core.matching import detr_match_cost, hungarian_assign
from ..models.positional import sine_positional_encoding
from .resnet import ResNet
from .transformer import FFN, MultiheadAttention


class DETROutputs(NamedTuple):
    cls_scores: jnp.ndarray   # (nl, B, Q, C+1) softmax logits
    bbox_preds: jnp.ndarray   # (nl, B, Q, 4) sigmoid cxcywh
    hs: jnp.ndarray           # (nl, B, Q, C)
    memory: jnp.ndarray       # (B, HW, C) encoder output (feats distill)


class DETREncoderLayer(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, pos, deterministic=True,
                 key_padding_mask=None):
        x = MultiheadAttention(self.embed_dims, self.num_heads, self.dropout,
                               name="self_attn")(
            x, x, x, query_pos=pos, key_pos=pos,
            deterministic=deterministic,
            key_padding_mask=key_padding_mask)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = FFN(self.embed_dims, self.feedforward_channels, self.dropout,
                name="ffn")(x, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x)


class DETRDecoderLayer(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q, query_pos, memory, mem_pos, deterministic=True,
                 key_padding_mask=None):
        q = MultiheadAttention(self.embed_dims, self.num_heads, self.dropout,
                               name="self_attn")(
            q, q, q, query_pos=query_pos, key_pos=query_pos,
            deterministic=deterministic)
        q = nn.LayerNorm(epsilon=1e-5, name="norm1")(q)
        q = MultiheadAttention(self.embed_dims, self.num_heads, self.dropout,
                               name="cross_attn")(
            q, memory, memory, query_pos=query_pos, key_pos=mem_pos,
            deterministic=deterministic,
            key_padding_mask=key_padding_mask)
        q = nn.LayerNorm(epsilon=1e-5, name="norm2")(q)
        q = FFN(self.embed_dims, self.feedforward_channels, self.dropout,
                name="ffn")(q, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(q)


class DETR(nn.Module):
    num_classes: int = 80
    num_query: int = 100
    embed_dims: int = 256
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    depth: int = 50
    frozen_stages: int = 1
    dropout: float = 0.1

    @nn.compact
    def __call__(self, images, img_hw, deterministic: bool = True):
        C = self.embed_dims
        feats = ResNet(depth=self.depth, out_indices=(3,),
                       frozen_stages=self.frozen_stages,
                       name="backbone")(images)
        x = nn.Conv(C, (1, 1), name="input_proj")(feats[0])
        B, H, W, _ = x.shape

        ys = jnp.arange(H)[None, :, None] * (images.shape[1] // H)
        xs = jnp.arange(W)[None, None, :] * (images.shape[2] // W)
        pad = (ys >= img_hw[:, 0, None, None]) | (
            xs >= img_hw[:, 1, None, None])
        pos = sine_positional_encoding(pad, num_feats=C // 2,
                                       dtype=x.dtype).reshape(B, H * W, C)
        tokens = x.reshape(B, H * W, C)
        pad_flat = pad.reshape(B, H * W)

        # the padded-region tokens are masked out of every attention
        # (detr_head.py forward passes `masks` to encoder AND decoder)
        for i in range(self.num_encoder_layers):
            tokens = DETREncoderLayer(
                C, feedforward_channels=2048, dropout=self.dropout,
                name=f"encoder_layer{i}")(tokens, pos, deterministic,
                                          key_padding_mask=pad_flat)
        memory = tokens

        query_embed = self.param("query_embedding",
                                 nn.initializers.normal(1.0),
                                 (self.num_query, C))
        q = jnp.zeros((B, self.num_query, C), x.dtype)
        qp = jnp.broadcast_to(query_embed[None].astype(x.dtype),
                              (B, self.num_query, C))

        post_norm = nn.LayerNorm(epsilon=1e-5, name="post_norm")
        inter = []
        for i in range(self.num_decoder_layers):
            q = DETRDecoderLayer(
                C, feedforward_channels=2048, dropout=self.dropout,
                name=f"decoder_layer{i}")(q, qp, memory, pos,
                                          deterministic,
                                          key_padding_mask=pad_flat)
            inter.append(post_norm(q))
        hs = jnp.stack(inter, 0)                  # (nl, B, Q, C)

        cls = nn.Dense(self.num_classes + 1, name="fc_cls")(hs)
        r = hs
        for i in range(2):
            r = nn.relu(nn.Dense(C, name=f"reg_ffn{i}")(r))
        bbox = jax.nn.sigmoid(nn.Dense(4, name="fc_reg")(r))
        return DETROutputs(cls, bbox, hs, memory)


class DETRLossConfig(NamedTuple):
    num_classes: int = 80
    bg_cls_weight: float = 0.1
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 5.0
    loss_iou_weight: float = 2.0


def detr_detection_loss(out: DETROutputs, gt_bboxes, gt_labels, gt_valid,
                        img_hw, cfg: DETRLossConfig
                        ) -> Dict[str, jnp.ndarray]:
    """Per-layer Hungarian + CE(bg 0.1) + L1 + GIoU (detr_head.py loss)."""
    nl, B, Q, _ = out.cls_scores.shape
    C = cfg.num_classes

    def assign_one(cls_s, box_p, boxes, labels, valid, hw):
        cost = detr_match_cost(cls_s, box_p, boxes, labels, hw,
                               cls_cost="softmax", cls_weight=1.0,
                               reg_weight=5.0, iou_weight=2.0)
        return hungarian_assign(cost, valid, labels)

    losses = {}
    num_pos = jnp.maximum(gt_valid.sum().astype(jnp.float32), 1.0)
    num_neg = B * Q - gt_valid.sum().astype(jnp.float32)
    cls_avg = jnp.maximum(num_pos + num_neg * cfg.bg_cls_weight, 1.0)
    class_weight = jnp.concatenate(
        [jnp.ones((C,)), jnp.array([cfg.bg_cls_weight])])

    G = gt_bboxes.shape[1]
    for lyr in range(nl):
        res = jax.vmap(lambda c, b, gb, gl, gv, hw: assign_one(
            c, b, gb, gl, gv, hw))(out.cls_scores[lyr], out.bbox_preds[lyr],
                                   gt_bboxes, gt_labels, gt_valid, img_hw)
        safe = jnp.clip(res.assigned_gt, 0, G - 1)
        h = img_hw[:, 0].astype(jnp.float32)
        w = img_hw[:, 1].astype(jnp.float32)
        factor = jnp.stack([w, h, w, h], -1)[:, None]
        tgt_xyxy_n = jnp.take_along_axis(gt_bboxes, safe[..., None],
                                         axis=1) / factor
        tgt_cxcywh = bbox_xyxy_to_cxcywh(tgt_xyxy_n)
        labels_q = jnp.where(res.pos_mask,
                             jnp.take_along_axis(
                                 gt_labels, safe, axis=1).astype(jnp.int32),
                             C)

        loss_cls = cfg.loss_cls_weight * L.cross_entropy_loss(
            out.cls_scores[lyr].reshape(-1, C + 1), labels_q.reshape(-1),
            weight=jnp.ones((B * Q,)), avg_factor=cls_avg,
            class_weight=class_weight)
        wpos = res.pos_mask.astype(jnp.float32)[..., None]
        loss_bbox = cfg.loss_bbox_weight * L.l1_loss(
            out.bbox_preds[lyr].reshape(-1, 4), tgt_cxcywh.reshape(-1, 4),
            weight=jnp.repeat(wpos, 4, -1).reshape(-1, 4),
            avg_factor=num_pos)
        pred_xyxy = bbox_cxcywh_to_xyxy(out.bbox_preds[lyr]) * factor
        loss_iou = cfg.loss_iou_weight * L.giou_loss(
            pred_xyxy.reshape(-1, 4),
            (tgt_xyxy_n * factor).reshape(-1, 4),
            weight=wpos.reshape(-1), avg_factor=num_pos)
        prefix = "" if lyr == nl - 1 else f"d{lyr}."
        losses[prefix + "loss_cls"] = loss_cls
        losses[prefix + "loss_bbox"] = loss_bbox
        losses[prefix + "loss_iou"] = loss_iou
    return losses


def detr_get_bboxes(out: DETROutputs, img_hw, score_thr: float = 0.0,
                    max_per_img: int = 100, scale_factor=None,
                    rescale: bool = False) -> Dict[str, jnp.ndarray]:
    """Decode the last decoder layer into fixed-size detections.

    Parity: detr_head._get_bboxes_single softmax branch — per-query score =
    max over foreground classes of softmax(C+1), top-k queries kept, cxcywh
    scaled to image coords and clamped to the valid (h, w). Returns the
    keep-ids the teacher protocol needs (detr_il.py out_teacher :116-154).
    """
    cls = out.cls_scores[-1]                       # (B, Q, C+1)
    box = out.bbox_preds[-1]                       # (B, Q, 4) cxcywh in [0,1]
    B, Q, _ = cls.shape
    probs = jax.nn.softmax(cls, axis=-1)[..., :-1]
    scores = probs.max(-1)
    labels = probs.argmax(-1).astype(jnp.int32)

    k = min(max_per_img, Q)
    top_scores, keep = jax.lax.top_k(scores, k)    # (B, k)
    valid = top_scores > score_thr
    take = lambda a: jnp.take_along_axis(
        a, keep.reshape(B, k, *([1] * (a.ndim - 2))), axis=1)
    h = img_hw[:, 0].astype(jnp.float32)
    w = img_hw[:, 1].astype(jnp.float32)
    factor = jnp.stack([w, h, w, h], -1)[:, None]  # (B, 1, 4)
    xyxy = bbox_cxcywh_to_xyxy(take(box)) * factor
    xyxy = jnp.clip(xyxy, 0.0, factor[..., [1, 0, 1, 0]][..., [2, 3, 0, 1]])
    # clamp x to w, y to h
    xyxy = jnp.stack([
        jnp.clip(xyxy[..., 0], 0, w[:, None]),
        jnp.clip(xyxy[..., 1], 0, h[:, None]),
        jnp.clip(xyxy[..., 2], 0, w[:, None]),
        jnp.clip(xyxy[..., 3], 0, h[:, None])], -1)
    if rescale and scale_factor is not None:
        xyxy = xyxy / scale_factor[:, None, :]
    return dict(bboxes=xyxy, scores=top_scores,
                labels=take(labels[..., None])[..., 0],
                logits=take(cls), keep_qid=keep, valid=valid)


class DETRDistillConfig(NamedTuple):
    """Flag-string distill menu for the DETR_il family (detr_il.py:291-305
    gates teacher products on 'soft' in cates_distill / feats_distill)."""
    hard: bool = True
    soft: bool = False
    feats_kldv: bool = False
    kd_weight: float = 10.0
    kd_T: float = 2.0
    fd_weight: float = 10.0
    fd_T: float = 2.0

    @classmethod
    def from_flags(cls, cates_distill="", locat_distill="",
                   feats_distill="", **kw):
        return cls(hard="hard" in cates_distill,
                   soft="soft" in cates_distill,
                   feats_kldv="kldv" in feats_distill, **kw)


def detr_teacher_out(outputs: DETROutputs, img_hw,
                     score_thr: float = 0.3, max_per_img: int = 100):
    """Frozen-teacher products (stop-gradded fixed-size detections)."""
    stop = jax.lax.stop_gradient
    det = detr_get_bboxes(outputs, img_hw, score_thr=score_thr,
                          max_per_img=max_per_img)
    return jax.tree.map(stop, det), jax.tree.map(stop, outputs)


def detr_compute_losses(out: DETROutputs, batch,
                        cfg: DETRLossConfig,
                        teacher_out: Optional[DETROutputs] = None,
                        distill_cfg: Optional[DETRDistillConfig] = None,
                        teacher_score_thr: float = 0.3,
                        teacher_max_per_img: int = 100
                        ) -> Dict[str, jnp.ndarray]:
    """Detection + DETR_il distill menu for one batch (jit-friendly).

    hard: teacher detections concatenated BEFORE the GT (teacher-first,
    matching the flagship merge order); soft: KL(student ‖ teacher) logits
    at the teacher's kept query ids, T² scaled; kldv: whole-memory KLDiv.
    """
    gt_bboxes, gt_labels, gt_valid = (batch.gt_bboxes, batch.gt_labels,
                                      batch.gt_valid)
    tdet = None
    if teacher_out is not None:
        tdet, teacher_out = detr_teacher_out(
            teacher_out, batch.img_hw, teacher_score_thr,
            teacher_max_per_img)
        if distill_cfg.hard:
            gt_bboxes = jnp.concatenate([tdet["bboxes"], gt_bboxes], axis=1)
            gt_labels = jnp.concatenate(
                [tdet["labels"].astype(gt_labels.dtype), gt_labels], axis=1)
            gt_valid = jnp.concatenate([tdet["valid"], gt_valid], axis=1)

    losses = detr_detection_loss(out, gt_bboxes, gt_labels, gt_valid,
                                 batch.img_hw, cfg)

    if tdet is not None:
        B, Q = out.cls_scores.shape[1:3]
        num_keep = jnp.maximum(tdet["valid"].sum().astype(jnp.float32), 1.0)
        keep_w = jnp.zeros((B, Q), jnp.float32).at[
            jnp.arange(B)[:, None], tdet["keep_qid"]].max(
            tdet["valid"].astype(jnp.float32))

        if distill_cfg.soft:
            Cp1 = out.cls_scores.shape[-1]
            losses["loss_kd"] = distill_cfg.kd_weight * L.kd_kl_div_loss(
                out.cls_scores[-1].reshape(-1, Cp1),
                teacher_out.cls_scores[-1].reshape(-1, Cp1),
                weight=keep_w.reshape(-1, 1), avg_factor=num_keep,
                T=distill_cfg.kd_T)

        if distill_cfg.feats_kldv:
            from ..distill.losses import _kd_kl_axis
            kl = _kd_kl_axis(out.memory, teacher_out.memory,
                             distill_cfg.fd_T, axis=-1)
            losses["loss_fd"] = distill_cfg.fd_weight * kl.sum() / B

    return losses


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return DETR(num_classes=m.num_classes, num_query=m.num_query,
                    depth=m.depth, frozen_stages=m.frozen_stages,
                    num_encoder_layers=m.num_encoder_layers,
                    num_decoder_layers=m.num_decoder_layers,
                    dropout=m.dropout)

    def losses(model, cfg, *, has_teacher=False, use_dropout=True, **_):
        det_cfg = DETRLossConfig(num_classes=cfg.model.num_classes)
        distill_cfg = DETRDistillConfig.from_flags(
            cates_distill=cfg.distill.cates_distill,
            feats_distill=cfg.distill.feats_distill) if has_teacher else None

        def losses_fn(variables, batch, teacher_vars, rng):
            # the reference trains vanilla DETR WITH dropout=0.1
            # (configs/detr/detr_r50_8x2_150e_coco.py); the frozen teacher
            # forward stays deterministic
            out = model.apply(
                variables, batch.images, batch.img_hw,
                deterministic=not use_dropout,
                rngs={"dropout": rng} if use_dropout else None)
            t_out = None
            if teacher_vars is not None:
                t_out = model.apply(teacher_vars, batch.images,
                                    batch.img_hw, deterministic=True)
            return detr_compute_losses(
                out, batch, det_cfg, teacher_out=t_out,
                distill_cfg=distill_cfg,
                teacher_score_thr=cfg.distill.teacher_score_thr,
                teacher_max_per_img=cfg.distill.teacher_max_per_img), None
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            d = detr_get_bboxes(out, img_hw, score_thr=score_thr,
                                max_per_img=max_per_img,
                                scale_factor=scale_factors, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("detr", build=build, losses=losses,
                    eval_step=eval_step)


_register()

"""GFL Deformable-DETR head: forward + box decoding (flax.linen).

Parity target: mmdet/models/dense_heads/gfl_deformable_detr_head_il.py
(forward :196-281, _init_layers :145-178, init_weights :179-194,
_get_bboxes_single :1589-1668). The regression branch emits
``2 + 4*(reg_max+1)`` channels; the reference sigmoids the WHOLE vector
(center offsets + distribution bins), adds the inverse-sigmoid reference to
the first two channels pre-sigmoid, and decodes (w, h) with the raw-sum
Integral_average over bins scaled to [0, 0.5].

The loss lives in dskd_tpu/models/gfl_detr_loss.py (pure function); the
incremental distillation losses in dskd_tpu/distill/losses.py.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.boxes import bbox_cxcywh_to_xyxy
from ..core.integral import integral_average
from ..core.postprocess import filter_scores_and_topk
from .transformer import DeformableDetrTransformer, inverse_sigmoid


def bias_init_with_prob(prior_prob: float) -> float:
    return -math.log((1 - prior_prob) / prior_prob)


class HeadOutputs(NamedTuple):
    """Static-shape head outputs (the reference's forward() return tuple).

    cls_scores: (nl, B, Q, num_classes) logits.
    bbox_preds: (nl, B, Q, 2 + 4*(reg_max+1)) sigmoided center+distribution.
    memory: (B, S, C) encoder output.
    hs: (nl, B, Q, C) decoder hidden states.
    mask_flat: (B, S) bool, True at padded tokens.
    """
    cls_scores: jnp.ndarray
    bbox_preds: jnp.ndarray
    memory: jnp.ndarray
    hs: jnp.ndarray
    mask_flat: jnp.ndarray


class GFLDeformableDETRHead(nn.Module):
    num_classes: int = 80
    num_query: int = 300
    embed_dims: int = 256
    reg_max: int = 16
    num_reg_fcs: int = 2
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    feedforward_channels: int = 1024
    dropout: float = 0.1
    remat: bool = True

    @nn.compact
    def __call__(self, mlvl_feats, img_hw, batch_input_shape,
                 deterministic: bool = True) -> HeadOutputs:
        C = self.embed_dims
        reg_out = 2 + 4 * (self.reg_max + 1)

        query_embedding = self.param(
            "query_embedding", nn.initializers.normal(1.0),
            (self.num_query, 2 * C))
        # unused by the loss but part of the reference's parameter surface
        self.param("prototype", nn.initializers.zeros,
                   (self.num_classes, C))

        transformer = DeformableDetrTransformer(
            embed_dims=C, num_heads=self.num_heads,
            num_levels=self.num_levels, num_points=self.num_points,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            feedforward_channels=self.feedforward_channels,
            dropout=self.dropout, num_query=self.num_query,
            remat=self.remat, name="transformer")
        hs, init_ref, inter_refs, memory, mask_flat = transformer(
            mlvl_feats, img_hw, batch_input_shape, query_embedding,
            deterministic=deterministic)

        # shared (tied across decoder layers — reference uses the same module
        # for every layer when with_box_refine=False, :170-175)
        cls_branch = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="cls_branch")

        # branches are shared across decoder layers (reference :170-175, no
        # box refine), so apply once to the stacked (nl, B, Q, C) states —
        # one large MXU matmul instead of nl small ones.
        x = hs
        for i in range(self.num_reg_fcs):
            x = nn.Dense(C, kernel_init=nn.initializers.xavier_uniform(),
                         name=f"reg_fc{i}")(x)
            x = nn.relu(x)
        tmp = nn.Dense(
            reg_out, kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32:
            jnp.zeros(shape, dtype).at[2:].set(-2.0),
            name="reg_out")(x)

        # layer l uses init_ref for l=0 and inter_refs[l-1] after (:256-260)
        refs = jnp.concatenate([init_ref[None], inter_refs[:-1]], axis=0)
        tmp = tmp.at[..., :2].add(inverse_sigmoid(refs))

        outputs_classes = cls_branch(hs)
        outputs_coords = jax.nn.sigmoid(tmp)
        return HeadOutputs(outputs_classes, outputs_coords, memory, hs,
                           mask_flat)


class DetResults(NamedTuple):
    """Fixed-size per-image detections (masked by ``valid``).

    bboxes: (B, k, 4) xyxy in (possibly rescaled) image coords.
    scores/labels/keep_qid/valid: (B, k).
    logits: (B, k, num_classes) raw cls logits of the kept queries.
    """
    bboxes: jnp.ndarray
    scores: jnp.ndarray
    labels: jnp.ndarray
    logits: jnp.ndarray
    keep_qid: jnp.ndarray
    valid: jnp.ndarray


def decode_boxes(bbox_preds: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """(..., 2+4*(reg_max+1)) sigmoided head output -> (..., 4) cxcywh."""
    centers = bbox_preds[..., :2]
    wh = integral_average(bbox_preds[..., 2:], reg_max)
    return jnp.concatenate([centers, wh], axis=-1)


def get_bboxes(cls_scores: jnp.ndarray, bbox_preds: jnp.ndarray,
               img_hw: jnp.ndarray, scale_factor: jnp.ndarray = None,
               reg_max: int = 16, score_thr: float = 0.0,
               max_per_img: int = 100, rescale: bool = False) -> DetResults:
    """Batch box decoding for the LAST decoder layer outputs.

    cls_scores: (B, Q, K) logits; bbox_preds: (B, Q, 2+4*(rm+1)); img_hw:
    (B, 2) valid (h, w); scale_factor: (B, 4) resize factors for rescale.
    Mirrors _get_bboxes_single: sigmoid -> threshold+topk over (Q*K) pairs ->
    integral decode -> scale to image coords -> clamp.
    """
    B, Q, K = cls_scores.shape
    probs = jax.nn.sigmoid(cls_scores)

    def per_image(prob, pred, logit, hw, sf):
        top = filter_scores_and_topk(prob, score_thr, max_per_img)
        sel = pred[top.keep_idxs]                        # (k, 2+4*(rm+1))
        cxcywh = decode_boxes(sel, reg_max)
        boxes = bbox_cxcywh_to_xyxy(cxcywh)
        h, w = hw[0].astype(boxes.dtype), hw[1].astype(boxes.dtype)
        boxes = boxes * jnp.stack([w, h, w, h])
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, w), jnp.clip(boxes[:, 1], 0, h),
            jnp.clip(boxes[:, 2], 0, w), jnp.clip(boxes[:, 3], 0, h)], -1)
        if rescale:
            boxes = boxes / sf[None, :]
        return DetResults(boxes, top.scores, top.labels,
                          logit[top.keep_idxs], top.keep_idxs, top.valid)

    if scale_factor is None:
        scale_factor = jnp.ones((B, 4), cls_scores.dtype)
    return jax.vmap(per_image)(probs, bbox_preds, cls_scores, img_hw,
                               scale_factor)

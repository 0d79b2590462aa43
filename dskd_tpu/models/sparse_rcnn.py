"""Sparse R-CNN (parity: mmdet detectors/sparse_rcnn.py +
roi_heads/sparse_roi_head.py + bbox_heads/dii_head.py +
configs/sparse_rcnn/sparse_rcnn_r50_fpn_1x_coco.py, box AP 37.9).

End-to-end detection from a LEARNED sparse set: 100 learnable proposal
boxes (init: the whole image) and 100 learnable proposal features refined
by 6 Dynamic Instance Interactive heads. Each stage: self-attention over
the proposal features -> DynamicConv instance interaction (the proposal
feature generates per-instance 1x1 conv params applied to its own
RoIAligned 7x7 features, in->64->out with LN+ReLU, flattened + projected)
-> FFN -> cls (focal) and reg (3 fc -> deltas, stds (0.5, 0.5, 1, 1))
against the DETACHED current boxes. Every stage is trained with its own
Hungarian assignment (focal 2.0 + L1 5.0 on image-normalized xyxy +
GIoU 2.0); decode is top-k sigmoid scores from the last stage (no NMS).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.anchors import delta2bbox
from ..core.boxes import bbox_overlaps
from ..core.matching import focal_loss_cost, hungarian_assign
from ..core.postprocess import filter_scores_and_topk
from ..ops.roi_align import multi_level_roi_align
from .fpn import FPN
from .gfl_detr_head import bias_init_with_prob
from .resnet import ResNet

NUM_PROPOSALS = 100
NUM_STAGES = 6
DELTA_STDS = (0.5, 0.5, 1.0, 1.0)


class SparseRCNNOutputs(NamedTuple):
    cls_scores: jnp.ndarray   # (stages, B, N, C) logits
    bboxes: jnp.ndarray       # (stages, B, N, 4) absolute xyxy
    # post-self-attention proposal features per stage (QueryInst's
    # attn_feats, dii_head.py:171); None unless with_attn
    attn_feats: jnp.ndarray = None
    neck_feats: Tuple[jnp.ndarray, ...] = None


class DynamicConv(nn.Module):
    """with_proj=False (QueryInst's mask iic) returns the per-position
    features (M, pool*pool, C) without the flatten+projection."""
    in_channels: int = 256
    feat_channels: int = 64
    pool: int = 7
    with_proj: bool = True

    @nn.compact
    def __call__(self, param_feat, roi_feat):
        """param_feat: (M, C); roi_feat: (M, pool, pool, C) -> (M, C)."""
        M = param_feat.shape[0]
        cin, cf = self.in_channels, self.feat_channels
        params = nn.Dense(cin * cf + cf * cin,
                          name="dynamic_layer")(param_feat)
        p_in = params[:, :cin * cf].reshape(M, cin, cf)
        p_out = params[:, cin * cf:].reshape(M, cf, cin)
        x = roi_feat.reshape(M, self.pool * self.pool, cin)
        x = jnp.einsum("mpc,mcf->mpf", x, p_in)
        x = nn.relu(nn.LayerNorm(epsilon=1e-5, name="norm_in")(x))
        x = jnp.einsum("mpf,mfc->mpc", x, p_out)
        x = nn.relu(nn.LayerNorm(epsilon=1e-5, name="norm_out")(x))
        if not self.with_proj:
            return x
        x = nn.Dense(cin, name="fc_layer")(x.reshape(M, -1))
        return nn.relu(nn.LayerNorm(epsilon=1e-5, name="fc_norm")(x))


class DIIHead(nn.Module):
    num_classes: int = 80
    embed_dims: int = 256
    num_heads: int = 8
    ffn_channels: int = 2048

    @nn.compact
    def __call__(self, roi_feat, proposal_feat):
        """roi_feat: (B, N, 7, 7, C); proposal_feat: (B, N, C)."""
        B, N, _, _, C = roi_feat.shape
        x = proposal_feat
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=C,
            deterministic=True, name="attention")(x, x, x)
        x = nn.LayerNorm(epsilon=1e-5, name="attention_norm")(x + attn)
        attn_feats = x                    # dii_head.py:171 attn_feats
        iic = DynamicConv(C, name="instance_interactive_conv")(
            x.reshape(B * N, C), roi_feat.reshape(B * N, 7, 7, C))
        x = nn.LayerNorm(epsilon=1e-5, name="iic_norm")(
            x + iic.reshape(B, N, C))
        y = nn.Dense(self.ffn_channels, name="ffn_fc1")(x)
        y = nn.Dense(C, name="ffn_fc2")(nn.relu(y))
        obj = nn.LayerNorm(epsilon=1e-5, name="ffn_norm")(x + y)

        cls_feat = nn.relu(nn.LayerNorm(epsilon=1e-5, name="cls_norm")(
            nn.Dense(C, use_bias=False, name="cls_fc")(obj)))
        reg_feat = obj
        for i in range(3):
            reg_feat = nn.relu(nn.LayerNorm(
                epsilon=1e-5, name=f"reg_norm{i}")(
                nn.Dense(C, use_bias=False, name=f"reg_fc{i}")(reg_feat)))
        cls = nn.Dense(
            self.num_classes,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="fc_cls")(cls_feat)
        deltas = nn.Dense(4, name="fc_reg")(reg_feat)
        return cls, deltas, obj, attn_feats


class SparseRCNN(nn.Module):
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = 1
    num_proposals: int = NUM_PROPOSALS
    num_stages: int = NUM_STAGES
    with_attn: bool = False    # also return per-stage attn_feats (QueryInst)

    @nn.compact
    def __call__(self, images, img_hw, deterministic: bool = True):
        B = images.shape[0]
        feats = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                       frozen_stages=self.frozen_stages,
                       name="backbone")(images)
        neck = FPN(out_channels=256, num_outs=4, start_level=0,
                   add_extra_convs="", name="neck")(feats)

        # learnable sparse set: boxes start as the whole image
        init_cxcywh = self.param(
            "init_proposal_boxes",
            lambda key, shape: jnp.tile(
                jnp.array([[0.5, 0.5, 1.0, 1.0]]), (shape[0], 1)),
            (self.num_proposals, 4))
        pf = self.param("init_proposal_features",
                        nn.initializers.normal(1.0),
                        (self.num_proposals, 256))

        h = img_hw[:, 0].astype(jnp.float32)
        w = img_hw[:, 1].astype(jnp.float32)
        whwh = jnp.stack([w, h, w, h], -1)[:, None]          # (B, 1, 4)
        cx, cy, bw, bh = (init_cxcywh[:, i] for i in range(4))
        boxes = jnp.stack([cx - bw / 2, cy - bh / 2,
                           cx + bw / 2, cy + bh / 2], -1)[None] * whwh
        boxes = jnp.broadcast_to(boxes, (B, self.num_proposals, 4))
        proposal_feat = jnp.broadcast_to(pf[None],
                                         (B, self.num_proposals, 256))

        all_cls, all_boxes, all_attn = [], [], []
        for s in range(self.num_stages):
            roi = jnp.stack([
                multi_level_roi_align(
                    tuple(f[b] for f in neck), boxes[b],
                    jnp.ones((self.num_proposals,), bool))
                for b in range(B)])                          # (B,N,7,7,C)
            cls, deltas, proposal_feat, attn = DIIHead(
                num_classes=self.num_classes,
                name=f"dii_head{s}")(roi, proposal_feat)
            new_boxes = delta2bbox(boxes, deltas, stds=DELTA_STDS)
            all_cls.append(cls)
            all_boxes.append(new_boxes)
            all_attn.append(attn)
            boxes = jax.lax.stop_gradient(new_boxes)
        return SparseRCNNOutputs(
            jnp.stack(all_cls, 0), jnp.stack(all_boxes, 0),
            jnp.stack(all_attn, 0) if self.with_attn else None,
            neck if self.with_attn else None)


class SparseRCNNLossConfig(NamedTuple):
    num_classes: int = 80
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 2.0
    loss_bbox_weight: float = 5.0
    loss_iou_weight: float = 2.0


def sparse_rcnn_loss(out: SparseRCNNOutputs, gt_bboxes, gt_labels,
                     gt_valid, img_hw, cfg: SparseRCNNLossConfig,
                     return_assigns: bool = False):
    S, B, N, C = out.cls_scores.shape
    G = gt_bboxes.shape[1]
    h = img_hw[:, 0].astype(jnp.float32)
    w = img_hw[:, 1].astype(jnp.float32)
    whwh = jnp.stack([w, h, w, h], -1)[:, None]

    losses = {}
    assigns = []
    for s in range(S):
        cls_s = out.cls_scores[s]
        boxes = out.bboxes[s]

        def assign_one(c, bx, gb, gl, gv, factor):
            cost_cls = 2.0 * focal_loss_cost(c, jnp.clip(gl, 0, C - 1))
            reg = 5.0 * jnp.abs(bx[:, None] / factor[None]
                                - gb[None] / factor[None]).sum(-1)
            iou = -2.0 * bbox_overlaps(bx, gb, mode="giou")
            return hungarian_assign(cost_cls + reg + iou, gv, gl)

        res = jax.vmap(assign_one)(cls_s, boxes, gt_bboxes, gt_labels,
                                   gt_valid, whwh[:, 0])
        assigns.append(res)
        pos = res.pos_mask
        num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
        safe = jnp.clip(res.assigned_gt, 0, G - 1)
        tgt = jnp.take_along_axis(gt_bboxes, safe[..., None], axis=1)
        labels = jnp.where(
            pos, jnp.take_along_axis(gt_labels, safe,
                                     axis=1).astype(jnp.int32), C)
        onehot = jax.nn.one_hot(labels, C + 1)[..., :C]
        lc = cfg.loss_cls_weight * L.sigmoid_focal_loss(
            cls_s.reshape(-1, C), onehot.reshape(-1, C),
            avg_factor=num_pos, gamma=cfg.focal_gamma,
            alpha=cfg.focal_alpha)
        wpos = jnp.repeat(pos.astype(jnp.float32)[..., None], 4, -1)
        lb = cfg.loss_bbox_weight * L.l1_loss(
            (boxes / whwh).reshape(-1, 4), (tgt / whwh).reshape(-1, 4),
            weight=wpos.reshape(-1, 4), avg_factor=num_pos)
        li = cfg.loss_iou_weight * L.giou_loss(
            boxes.reshape(-1, 4), tgt.reshape(-1, 4),
            weight=pos.astype(jnp.float32).reshape(-1),
            avg_factor=num_pos)
        pre = "" if s == S - 1 else f"s{s}."
        losses[pre + "loss_cls"] = lc
        losses[pre + "loss_bbox"] = lb
        losses[pre + "loss_iou"] = li
    if return_assigns:
        return losses, assigns
    return losses


def sparse_rcnn_get_bboxes(out: SparseRCNNOutputs, img_hw,
                           score_thr: float = 0.0, max_per_img: int = 100,
                           scale_factor=None, rescale: bool = False):
    cls = out.cls_scores[-1]
    boxes = out.bboxes[-1]
    B, N, C = cls.shape

    def per_image(c, bx, hw, sf):
        # Flat top-k over (N, C) sigmoid scores, NO border clamp: the
        # reference decodes with clip_border=False and simple_test
        # (sparse_roi_head.py:349-362) emits the last stage's boxes as-is.
        del hw
        probs = jax.nn.sigmoid(c)
        top = filter_scores_and_topk(probs, score_thr,
                                     min(max_per_img, N * C))
        bsel = bx[top.keep_idxs]
        if rescale and sf is not None:
            bsel = bsel / sf[None]
        return bsel, top.scores, top.labels, top.valid, top.keep_idxs

    if scale_factor is None:
        scale_factor = jnp.ones((B, 4), jnp.float32)
    nb, ns, nl, valid, qidx = jax.vmap(per_image)(cls, boxes, img_hw,
                                                  scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=valid, qidx=qidx)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return SparseRCNN(num_classes=m.num_classes, depth=m.depth,
                          frozen_stages=m.frozen_stages)

    def losses(model, cfg, **_):
        det_cfg = SparseRCNNLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            return sparse_rcnn_loss(out, batch.gt_bboxes,
                                    batch.gt_labels, batch.gt_valid,
                                    batch.img_hw, det_cfg), None
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            d = sparse_rcnn_get_bboxes(out, img_hw,
                                       scale_factor=scale_factors,
                                       score_thr=score_thr,
                                       max_per_img=max_per_img,
                                       rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("sparse_rcnn", build=build, losses=losses,
                    eval_step=eval_step)


_register()

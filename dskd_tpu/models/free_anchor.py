"""FreeAnchor family (parity: mmdet dense_heads/free_anchor_retina_head.py
+ configs/free_anchor/retinanet_free_anchor_r50_fpn_1x_coco.py, AP 38.7).

RetinaNet trunk/head trained with maximum-likelihood bag losses instead
of hard assignment:
  * per GT, a bag of the top-50 anchors by IoU; the bag's matched
    probability Mean-max(P_cls * exp(-smoothl1_bag)) is trained toward 1
    (positive bag loss, alpha 0.5, / num_gt);
  * every (anchor, class) is simultaneously a negative weighted by
    (1 - P{a in A+}) where the A+ membership probability ramps the
    DECODED box's IoU with same-class GTs from bbox_thr to the per-GT max
    (focal gamma 2, / num_gt * topk).
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..core.anchors import bbox2delta, delta2bbox
from ..core.boxes import bbox_overlaps
from .retinanet import RetinaNet, retina_anchors, retina_get_bboxes

EPS = 1e-12
PRE_ANCHOR_TOPK = 50
BBOX_THR = 0.6
# the free_anchor config overrides the retina coder to stds (0.1, 0.1,
# 0.2, 0.2) (retinanet_free_anchor_r50_fpn_1x_coco.py bbox_coder), unlike
# vanilla retinanet's identity stds
DELTA_STDS = (0.1, 0.1, 0.2, 0.2)


class FreeAnchorLossConfig(NamedTuple):
    num_classes: int = 80
    alpha: float = 0.5
    gamma: float = 2.0
    smooth_beta: float = 0.11
    reg_weight: float = 0.75


def free_anchor_loss(out, anchors, gt_bboxes, gt_labels, gt_valid,
                     cfg: FreeAnchorLossConfig) -> Dict[str, jnp.ndarray]:
    """out: RetinaHeadOutputs (per-level (B, H, W, A*C)/(B, H, W, A*4))."""
    B = out.cls_scores[0].shape[0]
    C = cfg.num_classes
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], 1)   # (B, N, C)
    reg_flat = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], 1)
    N = cls_flat.shape[1]
    G = gt_bboxes.shape[1]
    K = min(PRE_ANCHOR_TOPK, N)

    def per_image(cls_s, deltas, gb, gl, gv):
        safe_lbl = jnp.clip(gl, 0, C - 1)
        cls_prob = jax.nn.sigmoid(cls_s)                    # (N, C)

        # ---- A+ membership probability (detached) ----
        pred_boxes = jax.lax.stop_gradient(
            delta2bbox(anchors, deltas, stds=DELTA_STDS))
        obi = bbox_overlaps(gb, pred_boxes)                 # (G, N)
        obi = jnp.where(gv[:, None], obi, 0.0)
        t2 = jnp.clip(obi.max(1, keepdims=True), BBOX_THR + 1e-12)
        obp = jnp.clip((obi - BBOX_THR) / (t2 - BBOX_THR), 0.0, 1.0)
        obp = jnp.where(gv[:, None], obp, 0.0)
        onehot = jax.nn.one_hot(safe_lbl, C) * gv[:, None]  # (G, C)
        box_prob = jnp.max(
            jnp.where(onehot[:, None, :] > 0, obp[:, :, None], 0.0),
            axis=0)                                         # (N, C)

        # ---- positive bags ----
        quality = jnp.where(gv[:, None], bbox_overlaps(gb, anchors), -1.0)
        _, matched = jax.lax.top_k(quality, K)              # (G, K)
        m_cls = jnp.take_along_axis(
            cls_prob[matched],                              # (G, K, C)
            jnp.broadcast_to(safe_lbl[:, None, None], (G, K, 1)),
            axis=2)[..., 0]
        m_anchors = anchors[matched]                        # (G, K, 4)
        m_targets = bbox2delta(m_anchors,
                               jnp.broadcast_to(gb[:, None, :],
                                                m_anchors.shape),
                               stds=DELTA_STDS)
        m_preds = deltas[matched]                           # (G, K, 4)
        diff = jnp.abs(m_preds - m_targets)
        sl1 = jnp.where(diff < cfg.smooth_beta,
                        0.5 * diff ** 2 / cfg.smooth_beta,
                        diff - 0.5 * cfg.smooth_beta)
        m_box = jnp.exp(-cfg.reg_weight * sl1.sum(-1))      # (G, K)
        m_prob = m_cls * m_box
        w = 1.0 / jnp.clip(1.0 - m_prob, EPS)
        w = w / w.sum(1, keepdims=True)
        bag = jnp.clip((w * m_prob).sum(1), EPS, 1 - EPS)   # (G,)
        pos = cfg.alpha * jnp.where(gv, -jnp.log(bag), 0.0)

        # ---- negatives ----
        nprob = jnp.clip(cls_prob * (1 - box_prob), EPS, 1 - EPS)
        neg = (1 - cfg.alpha) * (nprob ** cfg.gamma) \
            * (-jnp.log(1 - nprob))
        return pos.sum(), neg.sum()

    pos, neg = jax.vmap(per_image)(cls_flat, reg_flat, gt_bboxes,
                                   gt_labels, gt_valid)
    num_pos = jnp.maximum(gt_valid.sum().astype(jnp.float32), 1.0)
    return dict(positive_bag_loss=pos.sum() / num_pos,
                negative_bag_loss=neg.sum() / (num_pos * K))


FreeAnchorRetinaNet = RetinaNet   # identical architecture, different loss
__all__ = ["FreeAnchorLossConfig", "free_anchor_loss",
           "FreeAnchorRetinaNet", "retina_anchors", "retina_get_bboxes"]


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return RetinaNet(num_classes=m.num_classes, depth=m.depth,
                         frozen_stages=m.frozen_stages,
                         backbone=m.backbone)

    def losses(model, cfg, **_):
        det_cfg = FreeAnchorLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            anchors = retina_anchors(
                [c.shape[1:3] for c in out.head.cls_scores])
            return free_anchor_loss(out.head, anchors, batch.gt_bboxes,
                                    batch.gt_labels, batch.gt_valid,
                                    det_cfg), None
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            anchors = retina_anchors(
                [c.shape[1:3] for c in out.head.cls_scores])
            # free_anchor's config swaps the retina coder stds for
            # (0.1, 0.1, 0.2, 0.2) (free_anchor config bbox_coder)
            d = retina_get_bboxes(out.head, anchors, img_hw,
                                  scale_factor=scale_factors,
                                  score_thr=max(score_thr, 0.05),
                                  max_per_img=max_per_img, rescale=True,
                                  delta_stds=DELTA_STDS)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("free_anchor", build=build, losses=losses,
                    eval_step=eval_step)


_register()

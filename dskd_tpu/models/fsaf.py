"""FSAF family (parity: mmdet dense_heads/fsaf_head.py +
configs/fsaf/fsaf_r50_fpn_1x_coco.py, box AP 37.4).

The anchor-free branch of Feature-Selective Anchor-Free training:
RetinaNet-style towers predict per-point class scores and ltrb distances
(relu+1e-4, in stride units). Training uses ONLINE FEATURE SELECTION —
each GT is assigned to the single pyramid level whose candidate loss
(mean focal over the effective region + mean IoU loss) is smallest,
computed from the CURRENT predictions, detached. The effective region is
the 0.2-shrunk box; the 0.5-shrunk ring is ignored (zero cls weight) on
the SELECTED level's neighbors in the reference — here the ignore ring is
applied on every level carrying the GT, the documented simplification.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.postprocess import batched_nms, filter_scores_and_topk, \
    filter_scores_and_topk_mlvl
from .fpn import FPN
from .gfl_detr_head import bias_init_with_prob
from .resnet import ResNet

STRIDES = (8, 16, 32, 64, 128)
EPS_EFF = 0.2     # effective (positive) shrink ratio
EPS_IGN = 0.5     # ignore shrink ratio


class FSAFHeadOutputs(NamedTuple):
    cls_scores: Tuple[jnp.ndarray, ...]   # (B, H, W, C)
    bbox_preds: Tuple[jnp.ndarray, ...]   # (B, H, W, 4) ltrb / stride


class FSAFOutputs(NamedTuple):
    head: FSAFHeadOutputs
    neck_feats: Tuple[jnp.ndarray, ...]


class FSAFHead(nn.Module):
    num_classes: int = 80
    stacked_convs: int = 4
    feat_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> FSAFHeadOutputs:
        # init parity (fsaf_head.py:46-55): head convs Normal(std=0.01),
        # conv_cls bias at prior prob 0.01
        n01 = nn.initializers.normal(0.01)
        convs = {}
        for i in range(self.stacked_convs):
            for p in ("cls", "reg"):
                convs[f"{p}{i}"] = nn.Conv(
                    self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=n01, name=f"{p}_conv{i}")
        conv_cls = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=n01,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="conv_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                           kernel_init=n01, name="conv_reg")
        cls_out, reg_out = [], []
        for f in feats:
            c = r = f
            for i in range(self.stacked_convs):
                c = nn.relu(convs[f"cls{i}"](c))
                r = nn.relu(convs[f"reg{i}"](r))
            cls_out.append(conv_cls(c))
            # relu + eps keeps distances positive (fsaf_head forward)
            reg_out.append(nn.relu(conv_reg(r)) + 1e-4)
        return FSAFHeadOutputs(tuple(cls_out), tuple(reg_out))


class FSAF(nn.Module):
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = 1

    @nn.compact
    def __call__(self, images, img_hw, deterministic: bool = True):
        feats = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                       frozen_stages=self.frozen_stages,
                       name="backbone")(images)
        neck = FPN(out_channels=256, num_outs=5, start_level=1,
                   add_extra_convs="on_input",
                   relu_before_extra_convs=False, name="neck")(feats)
        head = FSAFHead(num_classes=self.num_classes,
                        name="bbox_head")(neck)
        return FSAFOutputs(head, neck)


def _shrunk_mask(h, w, stride, gt, ratio):
    """(G, h, w) bool: cell centers inside the ratio-shrunk boxes."""
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
    cx = (gt[:, 0] + gt[:, 2]) / 2
    cy = (gt[:, 1] + gt[:, 3]) / 2
    gw = (gt[:, 2] - gt[:, 0]) * ratio / 2
    gh = (gt[:, 3] - gt[:, 1]) * ratio / 2
    return ((xs[None, None, :] >= (cx - gw)[:, None, None])
            & (xs[None, None, :] <= (cx + gw)[:, None, None])
            & (ys[None, :, None] >= (cy - gh)[:, None, None])
            & (ys[None, :, None] <= (cy + gh)[:, None, None]))


class FSAFLossConfig(NamedTuple):
    num_classes: int = 80
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.0


def fsaf_loss(out: FSAFHeadOutputs, gt_bboxes, gt_labels, gt_valid,
              cfg: FSAFLossConfig) -> Dict[str, jnp.ndarray]:
    """Online-feature-selection loss. Per (image, gt, level): candidate
    loss = mean focal over effective cells + mean IoU loss; the argmin
    level gets the GT's positives."""
    B = out.cls_scores[0].shape[0]
    C = cfg.num_classes
    G = gt_bboxes.shape[1]
    nl = len(out.cls_scores)

    def per_image(cls_maps, reg_maps, gt, labels, valid):
        cand_losses = []        # (L, G)
        level_data = []
        for lvl in range(nl):
            cs, rs = cls_maps[lvl], reg_maps[lvl]
            h, w = cs.shape[0:2]
            stride = STRIDES[lvl]
            eff = _shrunk_mask(h, w, stride, gt, EPS_EFF) \
                & valid[:, None, None]                       # (G, h, w)
            ign = _shrunk_mask(h, w, stride, gt, EPS_IGN) \
                & valid[:, None, None]
            ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
            xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
            px = jnp.tile(xs[None, :], (h, 1))
            py = jnp.tile(ys[:, None], (1, w))
            # TBLRBBoxCoder normalizer=4.0 on a stride-sized prior
            # (fsaf config bbox_coder): image dist = pred * 4 * stride
            d = rs * (4.0 * stride)                          # image ltrb
            boxes = jnp.stack([px - d[..., 0], py - d[..., 1],
                               px + d[..., 2], py + d[..., 3]], -1)
            # per-gt candidate losses on the effective cells (detached)
            safe_lbl = jnp.clip(labels, 0, C - 1)
            p = jax.nn.sigmoid(jax.lax.stop_gradient(cs))    # (h, w, C)
            pg = p[..., safe_lbl].transpose(2, 0, 1)         # (G, h, w)
            focal = -cfg.focal_alpha * (1 - pg) ** cfg.focal_gamma \
                * jnp.log(jnp.clip(pg, 1e-8))
            from ..core.boxes import bbox_overlaps
            dboxes = jax.lax.stop_gradient(boxes).reshape(-1, 4)
            ious = bbox_overlaps(dboxes, gt).reshape(h, w, G) \
                .transpose(2, 0, 1)                          # (G, h, w)
            iou_l = -jnp.log(jnp.clip(ious, 1e-8))
            n_eff = jnp.clip(eff.sum((1, 2)).astype(jnp.float32), 1.0)
            cand = ((focal + iou_l) * eff).sum((1, 2)) / n_eff
            cand = jnp.where(eff.any((1, 2)), cand, jnp.inf)
            cand_losses.append(cand)
            level_data.append((eff, ign, boxes, cs))
        cand = jnp.stack(cand_losses, 0)                     # (L, G)
        sel = jnp.argmin(cand, axis=0)                       # (G,)
        has_level = jnp.isfinite(cand.min(0)) & valid

        loss_cls_total = 0.0
        loss_bbox_total = 0.0
        num_pos = 0.0
        for lvl in range(nl):
            eff, ign, boxes, cs = level_data[lvl]
            on_lvl = (sel == lvl) & has_level                # (G,)
            pos = (eff & on_lvl[:, None, None])              # (G, h, w)
            pos_any = pos.any(0)
            # smaller gt index wins overlaps (arbitrary fixed tie-break)
            best = jnp.argmax(
                pos * jnp.arange(G, 0, -1)[:, None, None], axis=0)
            lbl = jnp.where(pos_any, jnp.clip(labels, 0, C - 1)[best], C)
            ignore = ign.any(0) & ~pos_any
            wgt = jnp.where(ignore, 0.0, 1.0)
            onehot = jax.nn.one_hot(lbl, C + 1)[..., :C]
            lc = L.sigmoid_focal_loss(
                cs.reshape(-1, C), onehot.reshape(-1, C),
                weight=wgt.reshape(-1, 1), avg_factor=1.0,
                gamma=cfg.focal_gamma, alpha=cfg.focal_alpha)
            tgt = gt[best.reshape(-1)]
            # fsaf config loss_bbox = IoULoss default mode='log' (-log IoU),
            # matching the level-selection metric above
            lb = L.iou_loss(boxes.reshape(-1, 4), tgt, linear=False,
                            weight=pos_any.reshape(-1).astype(jnp.float32),
                            avg_factor=1.0)
            loss_cls_total = loss_cls_total + lc
            loss_bbox_total = loss_bbox_total + lb
            num_pos = num_pos + pos_any.sum().astype(jnp.float32)
        return loss_cls_total, loss_bbox_total, num_pos

    lc, lb, npos = jax.vmap(per_image)(
        [c for c in out.cls_scores], [r for r in out.bbox_preds],
        gt_bboxes, gt_labels, gt_valid)
    denom = jnp.maximum(npos.sum(), 1.0)
    return dict(loss_cls=cfg.loss_cls_weight * lc.sum() / denom,
                loss_bbox=cfg.loss_bbox_weight * lb.sum() / denom)


def fsaf_get_bboxes(out: FSAFHeadOutputs, img_hw, scale_factor=None,
                    score_thr: float = 0.05, nms_iou: float = 0.5,
                    nms_pre: int = 1000, max_per_img: int = 100,
                    rescale: bool = False):
    B = out.cls_scores[0].shape[0]
    C = out.cls_scores[0].shape[-1]
    boxes_all, cls_all = [], []
    for lvl, (cs, rs) in enumerate(zip(out.cls_scores, out.bbox_preds)):
        h, w = cs.shape[1:3]
        stride = STRIDES[lvl]
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
        px = jnp.tile(xs[None, :], (h, 1)).reshape(-1)
        py = jnp.repeat(ys, w)
        d = rs.reshape(B, -1, 4) * (4.0 * stride)
        boxes = jnp.stack([px[None] - d[..., 0], py[None] - d[..., 1],
                           px[None] + d[..., 2], py[None] + d[..., 3]], -1)
        boxes_all.append(boxes)
        cls_all.append(cs.reshape(B, -1, C))
    boxes_flat = jnp.concatenate(boxes_all, 1)
    cls_flat = jnp.concatenate(cls_all, 1)

    level_sizes = [c.shape[1] * c.shape[2] for c in out.cls_scores]

    def per_image(cls_s, bx, hw, sf):
        probs = jax.nn.sigmoid(cls_s)
        # nms_pre applies PER LEVEL (the reference's
        # _get_bboxes_single loops levels)
        top = filter_scores_and_topk_mlvl(probs, score_thr,
                                          nms_pre, level_sizes)
        bsel = bx[top.keep_idxs]
        h, w = hw[0].astype(bsel.dtype), hw[1].astype(bsel.dtype)
        bsel = jnp.stack([
            jnp.clip(bsel[:, 0], 0, w), jnp.clip(bsel[:, 1], 0, h),
            jnp.clip(bsel[:, 2], 0, w), jnp.clip(bsel[:, 3], 0, h)], -1)
        nb, ns, nl_, keep, _ = batched_nms(bsel, top.scores, top.labels,
                                           nms_iou, max_per_img,
                                           valid=top.valid)
        if rescale and sf is not None:
            nb = nb / sf[None]
        return nb, ns, nl_, keep

    if scale_factor is None:
        scale_factor = jnp.ones((B, 4), jnp.float32)
    nb, ns, nl_, keep = jax.vmap(per_image)(cls_flat, boxes_flat, img_hw,
                                            scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl_, valid=keep)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return FSAF(num_classes=m.num_classes, depth=m.depth,
                    frozen_stages=m.frozen_stages)

    def losses(model, cfg, **_):
        det_cfg = FSAFLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            return fsaf_loss(out.head, batch.gt_bboxes, batch.gt_labels,
                             batch.gt_valid, det_cfg), None
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            d = fsaf_get_bboxes(out.head, img_hw,
                                scale_factor=scale_factors,
                                score_thr=max(score_thr, 0.05),
                                max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("fsaf", build=build, losses=losses,
                    eval_step=eval_step)


_register()

"""Cascade RPN (parity: mmdet dense_heads/cascade_rpn_head.py +
core/bbox/assigners/region_assigner.py + configs/cascade_rpn/
crpn_r50_caffe_fpn_1x_coco.py, AR1000 81.4 vs RPN's 58.3).

Two-stage anchor refinement with ONE square anchor per position
(scale 8, ratio 1, strides 4-64):
  * stage 1: dilation-3 conv, no classifier, bridged features (stage 2
    consumes stage-1's activated maps), RegionAssigner targets (anchor
    centers inside the 0.2-shrunk gt region at the gt's scale-matched
    level are positive; the 0.5 region and adjacent levels are ignored;
    later gts overwrite earlier), linear IoU loss (w10) on DECODED boxes
    with stds (.1, .1, .5, .5), guided-anchoring avg factor
    total_anchors/200;
  * stage 2: AdaptiveConv 'offset' — a DeformConv2d whose 3x3 taps are
    steered to each REFINED anchor (center offset + shape-scaled taps,
    anchor_offset at cascade_rpn_head.py:328) — sigmoid objectness +
    IoU loss, MaxIoU 0.7/0.7/0.3 assignment with 256-sample random
    sampling on the refined anchors, stds (.05, .05, .1, .1).

TPU-native: the RegionAssigner's per-gt python loop becomes a
lax.scan over padded GT slots (order-faithful overwrite); per-image
anchor offsets feed the framework's explicit-offset deform_conv2d op."""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.anchors import delta2bbox
from ..core.max_iou_assigner import max_iou_assign, random_sample
from ..core.postprocess import batched_nms
from ..ops.deform_conv import deform_conv2d
from .fpn import FPN
from .resnet import ResNet

STRIDES = (4, 8, 16, 32, 64)
ANCHOR_SCALE = 8
STAGE1_STDS = (0.1, 0.1, 0.5, 0.5)
STAGE2_STDS = (0.05, 0.05, 0.1, 0.1)


def crpn_anchors(featmap_sizes: Sequence[Tuple[int, int]]):
    """One square anchor per position: side = scale * stride."""
    out = []
    for (h, w), s in zip(featmap_sizes, STRIDES):
        cy = (jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5) * s
        cx = (jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5) * s
        half = ANCHOR_SCALE * s / 2.0
        a = jnp.stack([
            jnp.broadcast_to(cx - half, (h, w)),
            jnp.broadcast_to(cy - half, (h, w)),
            jnp.broadcast_to(cx + half, (h, w)),
            jnp.broadcast_to(cy + half, (h, w))], -1)
        out.append(a.reshape(-1, 4))
    return out


def anchor_offsets(anchors_lvl, stride: int, hw: Tuple[int, int]):
    """DeformConv tap offsets steering a 3x3 kernel to each anchor
    (cascade_rpn_head.py anchor_offset: center offset + shape offset),
    in the op's interleaved (dy, dx) order. anchors: (B, h*w, 4)."""
    h, w = hw
    B = anchors_lvl.shape[0]
    ks = 3
    idx = jnp.arange(-1, 2, dtype=jnp.float32)
    yy = jnp.repeat(idx, ks)                        # (9,) row-major taps
    xx = jnp.tile(idx, ks)
    aw = (anchors_lvl[..., 2] - anchors_lvl[..., 0]) / stride
    ah = (anchors_lvl[..., 3] - anchors_lvl[..., 1]) / stride
    sx = (aw / (ks - 1) - 1.0)[..., None] * xx      # (B, A, 9)
    sy = (ah / (ks - 1) - 1.0)[..., None] * yy
    cx = (anchors_lvl[..., 0] + anchors_lvl[..., 2]) * 0.5 / stride
    cy = (anchors_lvl[..., 1] + anchors_lvl[..., 3]) * 0.5 / stride
    gx = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)[None]
    gy = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)[None]
    ox = sx + (cx - gx)[..., None]
    oy = sy + (cy - gy)[..., None]
    off = jnp.stack([oy, ox], -1).reshape(B, h, w, ks * ks * 2)
    return off


def region_assign(anchors_list, featmap_sizes, gt_bboxes, gt_valid,
                  center_ratio: float = 0.2, ignore_ratio: float = 0.5):
    """RegionAssigner for ONE image, vectorized with an order-faithful
    scan over padded GT slots. Returns (A,) assigned gt index (-1 ignore,
    -2 negative, >=0 positive) over the flattened levels."""
    num_lvls = len(anchors_list)
    r1 = (1 - center_ratio) / 2
    r2 = (1 - ignore_ratio) / 2
    scale = jnp.sqrt(jnp.clip(
        (gt_bboxes[:, 2] - gt_bboxes[:, 0])
        * (gt_bboxes[:, 3] - gt_bboxes[:, 1]), 1e-6, None))
    min_sz = float(ANCHOR_SCALE * STRIDES[0])
    tgt_lvl = jnp.clip(jnp.floor(jnp.log2(scale / min_sz) + 0.5),
                       0, num_lvls - 1).astype(jnp.int32)

    # per-level anchor centers in FEATURE coords + level ids, flattened
    ctrs, lvl_ids = [], []
    for lvl, (a, s) in enumerate(zip(anchors_list, STRIDES)):
        ctrs.append(jnp.stack([(a[:, 0] + a[:, 2]) * 0.5 / s,
                               (a[:, 1] + a[:, 3]) * 0.5 / s], -1))
        lvl_ids.append(jnp.full((a.shape[0],), lvl, jnp.int32))
    ctr = jnp.concatenate(ctrs, 0)                  # (A, 2) feature coords
    lvl_id = jnp.concatenate(lvl_ids, 0)
    fmaps = jnp.asarray(featmap_sizes, jnp.float32)  # (L, 2) as (h, w)

    def region_flags(gt, ratio, lvl):
        """Anchor-center-inside-region flags at level ``lvl`` (one gt)."""
        s = jnp.asarray(STRIDES, jnp.float32)[lvl]
        x1 = jnp.round((1 - ratio) * gt[0] / s + ratio * gt[2] / s)
        y1 = jnp.round((1 - ratio) * gt[1] / s + ratio * gt[3] / s)
        x2 = jnp.round(ratio * gt[0] / s + (1 - ratio) * gt[2] / s)
        y2 = jnp.round(ratio * gt[1] / s + (1 - ratio) * gt[3] / s)
        hw = fmaps[lvl]
        # calc_region clamps to the featmap EXTENT (region_assigner.py:20-23)
        x1 = jnp.clip(x1, 0, hw[1])
        y1 = jnp.clip(y1, 0, hw[0])
        x2 = jnp.clip(x2, 0, hw[1])
        y2 = jnp.clip(y2, 0, hw[0])
        inside = ((ctr[:, 0] >= x1) & (ctr[:, 0] <= x2)
                  & (ctr[:, 1] >= y1) & (ctr[:, 1] <= y2))
        return inside & (lvl_id == lvl)

    def body(state, g):
        assigned, adj_ignore = state
        gt = gt_bboxes[g]
        ok = gt_valid[g]
        lvl = tgt_lvl[g]
        ign = region_flags(gt, r2, lvl) & ok
        pos = region_flags(gt, r1, lvl) & ok
        assigned = jnp.where(ign, -1, assigned)
        assigned = jnp.where(pos, g, assigned)
        adj = (region_flags(gt, r2, jnp.maximum(lvl - 1, 0))
               & (lvl > 0)) | (
            region_flags(gt, r2, jnp.minimum(lvl + 1, num_lvls - 1))
            & (lvl < num_lvls - 1))
        adj_ignore = adj_ignore | (adj & ok)
        return (assigned, adj_ignore), None

    A = ctr.shape[0]
    init = (jnp.full((A,), -2, jnp.int32), jnp.zeros((A,), bool))
    (assigned, adj_ignore), _ = jax.lax.scan(
        body, init, jnp.arange(gt_bboxes.shape[0]))
    return jnp.where(adj_ignore, -1, assigned)


class StageCRPNConv(nn.Module):
    """One cascade stage's conv trunk + heads (per level, shared)."""
    with_cls: bool = True
    adapt: str = "dilation"      # or 'offset'
    channels: int = 256

    @nn.compact
    def __call__(self, x, offsets=None):
        if self.adapt == "offset":
            w = self.param("adapt_weight",
                           nn.initializers.normal(0.01),
                           (3, 3, x.shape[-1], self.channels))
            y = deform_conv2d(x, offsets, w)
        else:
            y = nn.Conv(self.channels, (3, 3), padding=[(3, 3), (3, 3)],
                        kernel_dilation=(3, 3), name="rpn_conv")(x)
        y = nn.relu(y)
        cls = (nn.Conv(1, (1, 1), name="rpn_cls")(y)
               if self.with_cls else None)
        reg = nn.Conv(4, (1, 1), name="rpn_reg")(y)
        return y, cls, reg


class CRPNOutputs(NamedTuple):
    s1_regs: Tuple[jnp.ndarray, ...]       # per level (B, h, w, 4)
    s2_cls: Tuple[jnp.ndarray, ...]        # per level (B, h, w, 1)
    s2_regs: Tuple[jnp.ndarray, ...]
    refined: Tuple[jnp.ndarray, ...]       # per level (B, h*w, 4) anchors
    feat_hw: Tuple[Tuple[int, int], ...]


class CascadeRPN(nn.Module):
    depth: int = 50
    frozen_stages: int = 1

    def setup(self):
        self.backbone = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                               frozen_stages=self.frozen_stages)
        self.neck = FPN(out_channels=256, num_outs=5, start_level=0,
                        add_extra_convs="on_input",
                        relu_before_extra_convs=False)
        self.stage1 = StageCRPNConv(with_cls=False, adapt="dilation",
                                    name="stage0")
        self.stage2 = StageCRPNConv(with_cls=True, adapt="offset",
                                    name="stage1")

    def __call__(self, images, img_hw, deterministic: bool = True):
        feats = self.neck(self.backbone(images))
        hw = tuple(f.shape[1:3] for f in feats)
        anchors = crpn_anchors(hw)
        B = images.shape[0]
        s1_regs, bridged = [], []
        for f in feats:
            y, _, reg = self.stage1(f)
            bridged.append(y)                 # bridged_feature=True
            s1_regs.append(reg)
        refined, s2_cls, s2_regs = [], [], []
        for lvl, y in enumerate(bridged):
            h, w = hw[lvl]
            ref = delta2bbox(
                jnp.broadcast_to(anchors[lvl][None], (B,) + anchors[lvl].shape),
                jax.lax.stop_gradient(s1_regs[lvl]).reshape(B, -1, 4),
                stds=STAGE1_STDS)
            refined.append(ref)
            off = anchor_offsets(ref, STRIDES[lvl], (h, w))
            _, cls, reg = self.stage2(y, offsets=off)
            s2_cls.append(cls)
            s2_regs.append(reg)
        return CRPNOutputs(tuple(s1_regs), tuple(s2_cls), tuple(s2_regs),
                           tuple(refined), hw)


def crpn_loss(out: CRPNOutputs, gt_bboxes, gt_valid, rng,
              num_samples: int = 256, pos_fraction: float = 0.5):
    """Both stage losses (CascadeRPNHead.forward_train)."""
    B = out.s1_regs[0].shape[0]
    anchors_list = crpn_anchors(out.feat_hw)
    anchors = jnp.concatenate(anchors_list, 0)
    A = anchors.shape[0]
    s1 = jnp.concatenate([r.reshape(B, -1, 4) for r in out.s1_regs], 1)
    s2c = jnp.concatenate([c.reshape(B, -1) for c in out.s2_cls], 1)
    s2 = jnp.concatenate([r.reshape(B, -1, 4) for r in out.s2_regs], 1)
    refined = jnp.concatenate(out.refined, 1)       # (B, A, 4)
    G = gt_bboxes.shape[1]

    # stage 1: region assignment, IoU loss on decoded boxes, avg A/200
    assign1 = jax.vmap(lambda b, v: region_assign(
        anchors_list, out.feat_hw, b, v))(gt_bboxes, gt_valid)
    pos1 = assign1 >= 0
    tgt1 = jnp.take_along_axis(
        gt_bboxes, jnp.clip(assign1, 0, G - 1)[..., None], axis=1)
    dec1 = delta2bbox(jnp.broadcast_to(anchors[None], (B, A, 4)),
                      s1, stds=STAGE1_STDS)
    losses = {"s0.loss_rpn_reg": 10.0 * L.iou_loss(
        dec1.reshape(-1, 4), tgt1.reshape(-1, 4),
        weight=pos1.astype(jnp.float32).reshape(-1),
        avg_factor=B * A / 200.0)}

    # stage 2: MaxIoU 0.7/0.7/0.3 on the refined anchors + 256 samples
    def assign_one(r, ref_b, gb, gv):
        res = max_iou_assign(ref_b, gb, jnp.zeros((G,), jnp.int32), gv, 1,
                             pos_iou_thr=0.7, neg_iou_thr=0.7,
                             min_pos_iou=0.3)
        sample = random_sample(r, res.assigned_gt, num_samples,
                               pos_fraction)
        idx = jnp.concatenate([sample.pos_idx, sample.neg_idx])
        valid = jnp.concatenate([sample.pos_valid, sample.neg_valid])
        is_pos = jnp.concatenate([sample.pos_valid,
                                  jnp.zeros_like(sample.neg_valid)])
        return idx, valid, is_pos, jnp.clip(res.assigned_gt[idx], 0, G - 1)

    rngs = jax.random.split(rng, B)
    idx, valid, is_pos, gt_idx = jax.vmap(assign_one)(
        rngs, refined, gt_bboxes, gt_valid)
    S = idx.shape[1]
    cls_s = jnp.take_along_axis(s2c, idx, axis=1)
    reg_s = jnp.take_along_axis(s2, idx[..., None], axis=1)
    ref_s = jnp.take_along_axis(refined, idx[..., None], axis=1)
    tgt2 = jnp.take_along_axis(gt_bboxes, gt_idx[..., None], axis=1)
    vf = valid.reshape(-1).astype(jnp.float32)
    pf = is_pos.reshape(-1).astype(jnp.float32)
    ntotal = jnp.maximum(vf.sum(), 1.0)
    losses["s1.loss_rpn_cls"] = L.bce_loss(
        cls_s.reshape(-1), pf, weight=vf, avg_factor=ntotal)
    dec2 = delta2bbox(ref_s.reshape(-1, 4), reg_s.reshape(-1, 4),
                      stds=STAGE2_STDS)
    losses["s1.loss_rpn_reg"] = 10.0 * L.iou_loss(
        dec2, tgt2.reshape(-1, 4), weight=pf, avg_factor=ntotal)
    return losses


def crpn_proposals(out: CRPNOutputs, img_hw, nms_pre: int = 2000,
                   max_total: int = 2000, nms_iou: float = 0.8):
    """Stage-2 decode -> NMS proposals, following the reference protocol
    (cascade_rpn_head.py:582-651 + crpn test_cfg: nms_pre=2000 applied PER
    LEVEL, NMS 0.8 with level ids as the batched-NMS classes — proposals
    from different levels never suppress each other — max_per_img 2000)."""
    B = out.s1_regs[0].shape[0]

    def per_image(cs, regs, refs, hw):
        sc, bx, lv = [], [], []
        for lvl in range(len(cs)):
            scores = jax.nn.sigmoid(cs[lvl])
            k = min(nms_pre, scores.shape[0])
            top_s, ti = jax.lax.top_k(scores, k)
            boxes = delta2bbox(refs[lvl][ti], regs[lvl][ti],
                               stds=STAGE2_STDS)
            sc.append(top_s)
            bx.append(boxes)
            lv.append(jnp.full((k,), lvl, jnp.int32))
        scores = jnp.concatenate(sc)
        boxes = jnp.concatenate(bx, 0)
        h = hw[0].astype(boxes.dtype)
        w = hw[1].astype(boxes.dtype)
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, w), jnp.clip(boxes[:, 1], 0, h),
            jnp.clip(boxes[:, 2], 0, w), jnp.clip(boxes[:, 3], 0, h)], -1)
        nb, ns, _, keep, _ = batched_nms(
            boxes, scores, jnp.concatenate(lv), nms_iou, max_total)
        return nb, ns, keep

    cs = tuple(c.reshape(B, -1) for c in out.s2_cls)
    regs = tuple(r.reshape(B, -1, 4) for r in out.s2_regs)
    return jax.vmap(per_image)(cs, regs, out.refined, img_hw)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        return CascadeRPN(depth=cfg.model.depth,
                          frozen_stages=cfg.model.frozen_stages)

    def losses(model, cfg, **_):
        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw)
            return crpn_loss(out, batch.gt_bboxes, batch.gt_valid,
                             rng), None
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            props, scores, pvalid = crpn_proposals(out, img_hw,
                                                   max_total=max_per_img)
            return Det(props / scale_factors[:, None, :], scores,
                       jnp.zeros(scores.shape, jnp.int32), pvalid)
        return step

    register_family("cascade_rpn", build=build, losses=losses,
                    eval_step=eval_step)


_register()

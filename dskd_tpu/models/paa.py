"""PAA family (parity: mmdet dense_heads/paa_head.py +
configs/paa/paa_r50_fpn_1x_coco.py, box AP 40.4).

Probabilistic Anchor Assignment on an ATSS-shaped head (GN towers, one
scale-8 anchor per cell, cls + delta-reg + IoU-prediction branches):
  * per GT, the top-9 anchors PER LEVEL by current combined loss
    (focal cls + GIoU, detached) form the candidate set;
  * a 2-component 1-D Gaussian mixture is fit to the candidate scores
    with a FIXED-ITERATION EM (TPU-native: no data-dependent loops) and
    anchors belonging to the better component become positives;
  * losses: focal cls, GIoU on positives, BCE IoU prediction; decode
    scores are sqrt(cls * iou_pred), and post-NMS boxes are refined by
    score voting (paa_head.py:692: IoU-and-score weighted averaging of
    same-class candidates).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.anchors import base_anchors, delta2bbox, grid_anchors
from ..core.boxes import bbox_overlaps
from ..core.postprocess import batched_nms, filter_scores_and_topk, \
    filter_scores_and_topk_mlvl
from .atss import DELTA_STDS
from .fcos import Scale
from .fpn import FPN
from .gfl_detr_head import bias_init_with_prob
from .resnet import ResNet

STRIDES = (8, 16, 32, 64, 128)
ANCHOR_SCALE = 8
TOPK_PER_LEVEL = 9
EM_ITERS = 10


class PAAHeadOutputs(NamedTuple):
    cls_scores: Tuple[jnp.ndarray, ...]   # (B, H, W, C)
    bbox_preds: Tuple[jnp.ndarray, ...]   # (B, H, W, 4) deltas
    iou_preds: Tuple[jnp.ndarray, ...]    # (B, H, W, 1)


class PAAOutputs(NamedTuple):
    head: PAAHeadOutputs
    neck_feats: Tuple[jnp.ndarray, ...]


class PAAHead(nn.Module):
    num_classes: int = 80
    stacked_convs: int = 4
    feat_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> PAAHeadOutputs:
        # init parity (ATSS init scheme, atss_head.py:36-43): head convs
        # Normal(std=0.01), paa_cls bias at prior prob 0.01
        n01 = nn.initializers.normal(0.01)
        convs = {}
        for i in range(self.stacked_convs):
            for p in ("cls", "reg"):
                convs[f"{p}{i}"] = nn.Conv(
                    self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=n01, name=f"{p}_conv{i}")
                convs[f"{p}{i}_gn"] = nn.GroupNorm(
                    epsilon=1e-5, num_groups=32, name=f"{p}_gn{i}")
        paa_cls = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=n01,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="paa_cls")
        paa_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                          kernel_init=n01, name="paa_reg")
        paa_iou = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                          kernel_init=n01, name="paa_iou")
        cls_out, reg_out, iou_out = [], [], []
        for lvl, f in enumerate(feats):
            c = r = f
            for i in range(self.stacked_convs):
                c = nn.relu(convs[f"cls{i}_gn"](convs[f"cls{i}"](c)))
                r = nn.relu(convs[f"reg{i}_gn"](convs[f"reg{i}"](r)))
            cls_out.append(paa_cls(c))
            reg_out.append(Scale(name=f"scale{lvl}")(paa_reg(r)))
            iou_out.append(paa_iou(r))
        return PAAHeadOutputs(tuple(cls_out), tuple(reg_out),
                              tuple(iou_out))


class PAA(nn.Module):
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = 1

    @nn.compact
    def __call__(self, images, img_hw, deterministic: bool = True):
        feats = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                       frozen_stages=self.frozen_stages,
                       name="backbone")(images)
        neck = FPN(out_channels=256, num_outs=5, start_level=1,
                   add_extra_convs="on_output",
                   relu_before_extra_convs=True, name="neck")(feats)
        head = PAAHead(num_classes=self.num_classes,
                       name="bbox_head")(neck)
        return PAAOutputs(head, neck)


def paa_anchors(featmap_sizes):
    per_level, counts = [], []
    for (h, w), stride in zip(featmap_sizes, STRIDES):
        base = base_anchors(stride, (ANCHOR_SCALE,), (1.0,))
        a = grid_anchors((h, w), stride, base)
        per_level.append(a)
        counts.append(a.shape[0])
    return jnp.concatenate(per_level, axis=0), tuple(counts)


def gmm_split(scores, valid, iters: int = EM_ITERS):
    """(K,) candidate scores (lower = better) + validity -> bool positive
    mask per the reference's separation scheme (c)
    (paa_head.py:324-400): fit a 2-component GMM (sklearn
    GaussianMixture(means_init=[min,max], precisions_init=1) replaced by
    a fixed-iteration EM), find the fg-assigned candidate with the PEAK
    total likelihood, and take every candidate whose loss is <= that
    peak's loss — not merely the fg-assigned members (scheme (b))."""
    K = scores.shape[0]
    big = 1e8
    s = jnp.where(valid, scores, big)
    smin = jnp.where(valid, s, big).min()
    smax = jnp.where(valid, s, -big).max()
    mu = jnp.stack([smin, smax])
    var = jnp.ones(2)               # sklearn precisions_init = 1.0
    pi = jnp.array([0.5, 0.5])

    def em(_, carry):
        mu, var, pi = carry
        logp = (-0.5 * (s[:, None] - mu[None]) ** 2 / var[None]
                - 0.5 * jnp.log(2 * jnp.pi * var[None])
                + jnp.log(jnp.clip(pi[None], 1e-8)))
        r = jax.nn.softmax(logp, axis=1)
        r = jnp.where(valid[:, None], r, 0.0)
        nk = jnp.clip(r.sum(0), 1e-6)
        mu = (r * s[:, None]).sum(0) / nk
        var = jnp.clip((r * (s[:, None] - mu[None]) ** 2).sum(0) / nk,
                       1e-4)
        pi = nk / jnp.clip(nk.sum(), 1e-6)
        return mu, var, pi

    mu, var, pi = jax.lax.fori_loop(0, iters, em, (mu, var, pi))
    logp = (-0.5 * (s[:, None] - mu[None]) ** 2 / var[None]
            - 0.5 * jnp.log(2 * jnp.pi * var[None])
            + jnp.log(jnp.clip(pi[None], 1e-8)))
    comp = jnp.argmax(logp, axis=1)
    lo = jnp.argmin(mu)                # the low-loss (= good) component
    fg = valid & (comp == lo)
    # scheme (c): gmm.score_samples = log sum_k pi_k N(s; mu_k, var_k);
    # positives = all candidates with loss <= the loss of the fg
    # candidate at the likelihood peak
    ll = jax.scipy.special.logsumexp(logp, axis=1)
    ll_fg = jnp.where(fg, ll, -jnp.inf)
    peak_loss = s[jnp.argmax(ll_fg)]
    return valid & fg.any() & (s <= peak_loss)


class PAALossConfig(NamedTuple):
    num_classes: int = 80
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.3
    loss_iou_weight: float = 0.5


def paa_loss(out: PAAHeadOutputs, anchors, level_counts, gt_bboxes,
             gt_labels, gt_valid, cfg: PAALossConfig,
             assign_out: PAAHeadOutputs = None
             ) -> Dict[str, jnp.ndarray]:
    """``assign_out``: head outputs that drive the candidate losses /
    GMM assignment. None = the student's own (PAA); a frozen TEACHER's
    outputs = Label Assignment Distillation (detectors/lad.py +
    lad_head.get_label_assignment — the teacher picks the positives, the
    student trains its own losses under them)."""
    B = out.cls_scores[0].shape[0]
    C = cfg.num_classes
    N = anchors.shape[0]
    G = gt_bboxes.shape[1]
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], 1)
    reg_flat = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], 1)
    iou_flat = jnp.concatenate(
        [r.reshape(B, -1) for r in out.iou_preds], 1)
    decoded = delta2bbox(anchors[None], reg_flat, stds=DELTA_STDS)

    acx = (anchors[:, 0] + anchors[:, 2]) / 2
    acy = (anchors[:, 1] + anchors[:, 3]) / 2

    def assign_one(cls_s, boxes, gb, gl, gv):
        """Candidate losses -> per-gt per-level topk -> GMM split."""
        cls_d = jax.lax.stop_gradient(cls_s)
        box_d = jax.lax.stop_gradient(boxes)
        safe_lbl = jnp.clip(gl, 0, C - 1)
        p = jax.nn.sigmoid(cls_d)[:, safe_lbl]              # (N, G)
        focal = -cfg.focal_alpha * (1 - p) ** cfg.focal_gamma \
            * jnp.log(jnp.clip(p, 1e-8))
        giou = 1 - bbox_overlaps(box_d, gb, mode="giou")    # (N, G)
        score = focal + cfg.loss_bbox_weight * giou         # lower better
        inside = ((acx[:, None] > gb[None, :, 0])
                  & (acx[:, None] < gb[None, :, 2])
                  & (acy[:, None] > gb[None, :, 1])
                  & (acy[:, None] < gb[None, :, 3])) & gv[None]
        score = jnp.where(inside, score, 1e8)

        # per level top-9 candidates per gt
        cand_idx, cand_ok = [], []
        start = 0
        for n in level_counts:
            kk = min(TOPK_PER_LEVEL, n)
            seg = score[start:start + n]                    # (n, G)
            _, idx = jax.lax.top_k(-seg.T, kk)              # (G, kk)
            cand_idx.append(idx + start)
            cand_ok.append(
                jnp.take_along_axis(seg.T, idx, 1) < 1e7)
            start += n
        cand_idx = jnp.concatenate(cand_idx, 1)             # (G, K)
        cand_ok = jnp.concatenate(cand_ok, 1)
        cand_score = jnp.take_along_axis(score.T, cand_idx, 1)
        is_pos = jax.vmap(gmm_split)(cand_score, cand_ok)   # (G, K)

        # scatter: anchor -> gt (later gts win ties, like the reference's
        # sequential per-gt assignment)
        assigned = jnp.full((N,), -1, jnp.int32)
        flat_idx = jnp.where(is_pos, cand_idx, N)
        gt_of = jnp.broadcast_to(
            jnp.arange(G, dtype=jnp.int32)[:, None], cand_idx.shape)
        assigned = assigned.at[flat_idx.reshape(-1)].set(
            gt_of.reshape(-1), mode="drop")
        pos = assigned >= 0
        labels = jnp.where(pos, safe_lbl[jnp.clip(assigned, 0, G - 1)], C)
        return assigned, pos, labels

    if assign_out is None:
        a_cls, a_dec = cls_flat, decoded
    else:
        a_cls = jnp.concatenate(
            [c.reshape(B, -1, C) for c in assign_out.cls_scores], 1)
        a_reg = jnp.concatenate(
            [r.reshape(B, -1, 4) for r in assign_out.bbox_preds], 1)
        a_dec = delta2bbox(anchors[None], a_reg, stds=DELTA_STDS)
    assigned, pos, labels = jax.vmap(assign_one)(
        jax.lax.stop_gradient(a_cls), jax.lax.stop_gradient(a_dec),
        gt_bboxes, gt_labels, gt_valid)
    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
    safe = jnp.clip(assigned, 0, G - 1)
    tgt = jnp.take_along_axis(gt_bboxes, safe[..., None], axis=1)

    onehot = jax.nn.one_hot(labels, C + 1)[..., :C]
    loss_cls = cfg.loss_cls_weight * L.sigmoid_focal_loss(
        cls_flat.reshape(-1, C), onehot.reshape(-1, C),
        avg_factor=num_pos, gamma=cfg.focal_gamma, alpha=cfg.focal_alpha)
    w = pos.astype(jnp.float32).reshape(-1)
    ious = jax.vmap(lambda p, t: bbox_overlaps(p, t, is_aligned=True))(
        jax.lax.stop_gradient(decoded), tgt)
    # paa_head.py:190-194: GIoU weighted by each positive's current
    # (detached) IoU, normalized by the IoU sum — NOT uniform/num_pos
    w_iou = (jnp.clip(ious, 1e-6) * pos.astype(jnp.float32)).reshape(-1)
    loss_bbox = cfg.loss_bbox_weight * L.giou_loss(
        decoded.reshape(-1, 4), tgt.reshape(-1, 4), weight=w_iou,
        avg_factor=jnp.maximum(w_iou.sum(), 1e-6))
    loss_iou = cfg.loss_iou_weight * L.bce_loss(
        iou_flat.reshape(-1), jnp.where(pos, ious, 0.0).reshape(-1),
        weight=w, avg_factor=num_pos)
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                loss_iou=loss_iou)


def score_voting(det_boxes, det_labels, cand_boxes, cand_probs,
                 score_thr: float = 0.05):
    """paa_head.py score_voting, vectorized: each post-NMS box becomes
    the exp(-(1-IoU)^2/0.025) * score weighted average of all same-class
    candidate boxes with IoU > 0.01 and score > thr. det_boxes (R, 4),
    cand_boxes (N, 4), cand_probs (N, C)."""
    from ..core.boxes import bbox_overlaps
    ious = bbox_overlaps(det_boxes, cand_boxes)          # (R, N)
    lab = jnp.clip(det_labels, 0, cand_probs.shape[-1] - 1)
    sc = cand_probs[:, lab].T                            # (R, N)
    w = jnp.exp(-((1.0 - ious) ** 2) / 0.025) * sc
    w = jnp.where((ious > 0.01) & (sc > score_thr), w, 0.0)
    denom = jnp.maximum(w.sum(-1, keepdims=True), 1e-12)
    voted = (w[..., None] * cand_boxes[None]).sum(1) / denom
    return jnp.where(w.sum(-1, keepdims=True) > 0, voted, det_boxes)


def paa_get_bboxes(out: PAAHeadOutputs, anchors, img_hw, scale_factor=None,
                   score_thr: float = 0.05, nms_iou: float = 0.6,
                   nms_pre: int = 1000, max_per_img: int = 100,
                   rescale: bool = False, with_score_voting: bool = True):
    B = out.cls_scores[0].shape[0]
    C = out.cls_scores[0].shape[-1]
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], 1)
    reg_flat = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], 1)
    iou_flat = jnp.concatenate(
        [r.reshape(B, -1) for r in out.iou_preds], 1)

    level_sizes = [c.shape[1] * c.shape[2] * (c.shape[3] // C)
                   for c in out.cls_scores]

    def per_image(cls_s, delta, iou_p, hw, sf):
        probs = jnp.sqrt(jnp.clip(
            jax.nn.sigmoid(cls_s) * jax.nn.sigmoid(iou_p)[:, None],
            1e-12))
        # nms_pre applies PER LEVEL (the reference's
        # _get_bboxes_single loops levels)
        top = filter_scores_and_topk_mlvl(probs, score_thr,
                                          nms_pre, level_sizes)
        boxes = delta2bbox(anchors[top.keep_idxs], delta[top.keep_idxs],
                           stds=DELTA_STDS)
        h, w = hw[0].astype(boxes.dtype), hw[1].astype(boxes.dtype)
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, w), jnp.clip(boxes[:, 1], 0, h),
            jnp.clip(boxes[:, 2], 0, w), jnp.clip(boxes[:, 3], 0, h)], -1)
        nb, ns, nl, keep, _ = batched_nms(boxes, top.scores, top.labels,
                                          nms_iou, max_per_img,
                                          valid=top.valid)
        if with_score_voting:
            # candidates: the pre-NMS top-k survivors with their probs
            cand_probs = probs[top.keep_idxs]
            cand_probs = jnp.where(top.valid[:, None], cand_probs, 0.0)
            nb = score_voting(nb, nl, boxes, cand_probs, score_thr)
        if rescale and sf is not None:
            nb = nb / sf[None]
        return nb, ns, nl, keep

    if scale_factor is None:
        scale_factor = jnp.ones((B, 4), jnp.float32)
    nb, ns, nl, keep = jax.vmap(per_image)(cls_flat, reg_flat, iou_flat,
                                           img_hw, scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=keep)


# --- family registrations (dskd_tpu/registry.py) ------------------------
# paa + lad share the PAA module; LAD consumes a frozen teacher's head
# outputs for label assignment (reference lad.py).

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return PAA(num_classes=m.num_classes, depth=m.depth,
                   frozen_stages=m.frozen_stages)

    def losses(model, cfg, *, arch, **_):
        from ..registry import teacher_model
        det_cfg = PAALossConfig(num_classes=cfg.model.num_classes)
        is_lad = arch == "lad"
        t_model = teacher_model(model, cfg) if is_lad else model

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            anchors, counts = paa_anchors(
                [c.shape[1:3] for c in out.head.cls_scores])
            assign_out = None
            if is_lad:
                assert teacher_vars is not None, \
                    "arch='lad' requires a frozen teacher (lad.py)"
                assign_out = t_model.apply(teacher_vars, batch.images,
                                           batch.img_hw,
                                           deterministic=True).head
            return paa_loss(out.head, anchors, counts, batch.gt_bboxes,
                            batch.gt_labels, batch.gt_valid, det_cfg,
                            assign_out=assign_out), None
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            anchors, _ = paa_anchors(
                [c.shape[1:3] for c in out.head.cls_scores])
            d = paa_get_bboxes(out.head, anchors, img_hw,
                               scale_factor=scale_factors,
                               score_thr=max(score_thr, 0.05),
                               max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    for name in ("paa", "lad"):
        register_family(
            name, build=build,
            losses=(lambda model, cfg, _a=name, **kw:
                    losses(model, cfg, arch=_a, **kw)),
            eval_step=eval_step)


_register()

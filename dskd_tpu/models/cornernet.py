"""CornerNet family (parity: mmdet dense_heads/corner_head.py:1086 +
detectors/cornernet.py + configs/cornernet/*, box AP 41.2 hourglass-104).

Detect objects as paired top-left / bottom-right corners:
  * corner pooling feature blocks — (conv->top pool) + (conv->left pool)
    for TL, bottom/right for BR (ops/corner_pool.py cummax formulation);
  * per corner type: class heatmap (gaussian-focal, radius from
    min_overlap=0.3), 1-d associative embedding (pull matched pairs
    together, push different objects apart), 2-d sub-pixel offset (L1 at
    corner cells);
  * decode: per-map 3x3 max-pool NMS, top-k corners, all TL x BR pairs
    scored by mean heat, rejected on class mismatch / geometry
    (br must be right-below tl) / embedding distance.

Static-shape discipline: K corners per map, K*K candidate pairs, fixed
top-k outputs with validity flags. Trained on every hourglass stack,
decoded from the last.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.postprocess import soft_nms
from ..ops.corner_pool import corner_pool
from .gfl_detr_head import bias_init_with_prob
from .hourglass import ConvBN, HourglassNet


class CornerHeadOutputs(NamedTuple):
    """Per-stack tuples; each element (B, H, W, ...) at stride 4."""
    tl_heats: Tuple[jnp.ndarray, ...]     # (B, H, W, C) logits
    br_heats: Tuple[jnp.ndarray, ...]
    tl_embs: Tuple[jnp.ndarray, ...]      # (B, H, W, 1)
    br_embs: Tuple[jnp.ndarray, ...]
    tl_offs: Tuple[jnp.ndarray, ...]      # (B, H, W, 2) (dx, dy)
    br_offs: Tuple[jnp.ndarray, ...]


class CornerNetOutputs(NamedTuple):
    head: CornerHeadOutputs
    neck_feats: Tuple[jnp.ndarray, ...]


class CascadeCornerPool(nn.Module):
    """The corner_head pool block: two pooled 3x3 branches summed, plus a
    1x1 skip, BN'd and fused (corner_head.py BiCornerPool)."""
    directions: Tuple[str, str]

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d1, d2 = self.directions
        p1 = corner_pool(
            ConvBN(128, 3, name="pool1_conv")(x, deterministic), d1)
        p2 = corner_pool(
            ConvBN(128, 3, name="pool2_conv")(x, deterministic), d2)
        y = ConvBN(256, 3, relu=False, name="merge_conv")(
            p1 + p2, deterministic)
        skip = ConvBN(256, 1, relu=False, name="skip_conv")(
            x, deterministic)
        return ConvBN(256, 3, name="out_conv")(
            nn.relu(y + skip), deterministic)


def _pred_branch(x, out_ch, name, bias_cls=False):
    y = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                        name=f"{name}_conv")(x))
    bias_init = (nn.initializers.constant(bias_init_with_prob(0.1))
                 if bias_cls else nn.initializers.zeros)
    return nn.Conv(out_ch, (1, 1), bias_init=bias_init,
                   name=f"{name}_out")(y)


class CornerHead(nn.Module):
    num_classes: int = 80
    num_stacks: int = 2

    @nn.compact
    def __call__(self, feats, deterministic: bool = True):
        outs = {k: [] for k in ("tlh", "brh", "tle", "bre", "tlo", "bro")}
        for i, f in enumerate(feats):
            tl = CascadeCornerPool(("top", "left"), name=f"tl_pool{i}")(
                f, deterministic)
            br = CascadeCornerPool(("bottom", "right"),
                                   name=f"br_pool{i}")(f, deterministic)
            outs["tlh"].append(_pred_branch(tl, self.num_classes,
                                            f"tl_heat{i}", bias_cls=True))
            outs["brh"].append(_pred_branch(br, self.num_classes,
                                            f"br_heat{i}", bias_cls=True))
            outs["tle"].append(_pred_branch(tl, 1, f"tl_emb{i}"))
            outs["bre"].append(_pred_branch(br, 1, f"br_emb{i}"))
            outs["tlo"].append(_pred_branch(tl, 2, f"tl_off{i}"))
            outs["bro"].append(_pred_branch(br, 2, f"br_off{i}"))
        return CornerHeadOutputs(
            tuple(outs["tlh"]), tuple(outs["brh"]), tuple(outs["tle"]),
            tuple(outs["bre"]), tuple(outs["tlo"]), tuple(outs["bro"]))


class CornerNet(nn.Module):
    num_classes: int = 80
    num_stacks: int = 2

    @nn.compact
    def __call__(self, images, img_hw, deterministic: bool = True):
        feats = HourglassNet(num_stacks=self.num_stacks,
                             name="backbone")(images, deterministic)
        head = CornerHead(num_classes=self.num_classes,
                          num_stacks=self.num_stacks,
                          name="bbox_head")(feats, deterministic)
        return CornerNetOutputs(head, feats)


def gaussian_radius(h, w, min_overlap: float = 0.3):
    """CornerNet gaussian radius (utils/gaussian_target.py): smallest of
    the three quadratic-root cases."""
    a1 = 1.0
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 - jnp.sqrt(jnp.clip(b1 ** 2 - 4 * a1 * c1, 0))) / (2 * a1)
    a2 = 4.0
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    r2 = (b2 - jnp.sqrt(jnp.clip(b2 ** 2 - 4 * a2 * c2, 0))) / (2 * a2)
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    r3 = (b3 + jnp.sqrt(jnp.clip(b3 ** 2 - 4 * a3 * c3, 0))) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def gaussian_splat_max(ix, iy, weights, radius, hw):
    """Max-combined WINDOWED gaussians at integer centers, matching
    gen_gaussian_target (utils/gaussian_target.py:32-65): the radius is
    int-truncated (``max(0, int(r))``), sigma = (2r+1)/6 on the truncated
    radius, and the kernel only covers the (2r+1)^2 window around the
    center — tails outside are exactly zero.

    ix/iy: (G,) int cells; weights: (G, C) per-gt channel weights (one-hot
    * validity); radius: (G,) continuous. Returns (H, W, C)."""
    H, W = hw
    r = jnp.floor(jnp.clip(radius, 0.0, None))              # int(r)
    sigma = (2.0 * r + 1.0) / 6.0
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    dy = ys[None, :] - iy[:, None].astype(jnp.float32)      # (G, H)
    dx = xs[None, :] - ix[:, None].astype(jnp.float32)      # (G, W)
    g = jnp.exp(-(dy[:, :, None] ** 2 + dx[:, None, :] ** 2)
                / jnp.clip(2 * sigma[:, None, None] ** 2, 1e-12))
    window = ((jnp.abs(dy)[:, :, None] <= r[:, None, None])
              & (jnp.abs(dx)[:, None, :] <= r[:, None, None]))
    g = jnp.where(window, g, 0.0)                           # (G, H, W)
    return (g[..., None] * weights[:, None, None, :]).max(0)


def corner_targets(gt_bboxes, gt_labels, gt_valid, h, w, num_classes,
                   stride: int = 4):
    """One image: gaussian heatmaps (h, w, C) x2, offset targets + masks
    at the integer corner cells, and the corner cell indices for the
    embedding loss. Max-combined gaussians (reference gen_gaussian_target).
    """
    G = gt_bboxes.shape[0]
    fx = gt_bboxes[:, [0, 2]] / stride
    fy = gt_bboxes[:, [1, 3]] / stride
    tlx, brx = fx[:, 0], fx[:, 1]
    tly, bry = fy[:, 0], fy[:, 1]
    itlx = jnp.clip(jnp.floor(tlx), 0, w - 1).astype(jnp.int32)
    itly = jnp.clip(jnp.floor(tly), 0, h - 1).astype(jnp.int32)
    ibrx = jnp.clip(jnp.floor(brx), 0, w - 1).astype(jnp.int32)
    ibry = jnp.clip(jnp.floor(bry), 0, h - 1).astype(jnp.int32)

    radius = jnp.clip(gaussian_radius((bry - tly), (brx - tlx)), 0.0, None)
    onehot = jax.nn.one_hot(
        jnp.clip(gt_labels, 0, num_classes - 1), num_classes) \
        * gt_valid[:, None]
    tl_heat = gaussian_splat_max(itlx, itly, onehot, radius, (h, w))
    br_heat = gaussian_splat_max(ibrx, ibry, onehot, radius, (h, w))
    tl_off = jnp.stack([tlx - itlx, tly - itly], -1)          # (G, 2)
    br_off = jnp.stack([brx - ibrx, bry - ibry], -1)
    tl_idx = itly * w + itlx                                  # (G,)
    br_idx = ibry * w + ibrx
    return (tl_heat, br_heat, tl_off, br_off, tl_idx, br_idx)


class CornerLossConfig(NamedTuple):
    num_classes: int = 80
    pull_weight: float = 0.1
    push_weight: float = 0.1
    off_weight: float = 1.0


def cornernet_loss(out: CornerHeadOutputs, gt_bboxes, gt_labels, gt_valid,
                   cfg: CornerLossConfig) -> Dict[str, jnp.ndarray]:
    B = out.tl_heats[0].shape[0]
    C = cfg.num_classes
    h, w = out.tl_heats[0].shape[1:3]
    G = gt_bboxes.shape[1]

    tgt = jax.vmap(lambda b, l, v: corner_targets(b, l, v, h, w, C))(
        gt_bboxes, gt_labels, gt_valid)
    tl_heat_t, br_heat_t, tl_off_t, br_off_t, tl_idx, br_idx = tgt
    nv = jnp.maximum(gt_valid.sum().astype(jnp.float32), 1.0)

    losses = {}
    for s in range(len(out.tl_heats)):
        det = 0.0
        for heat, heat_t in ((out.tl_heats[s], tl_heat_t),
                             (out.br_heats[s], br_heat_t)):
            p = jnp.clip(jax.nn.sigmoid(heat), 1e-4, 1 - 1e-4)
            det = det + L.gaussian_focal_loss(
                p.reshape(-1), heat_t.reshape(-1), avg_factor=nv)
        det = det / 2.0             # corner_head.py:621 (tl + br) / 2
        # embeddings at the gt corner cells
        te = jax.vmap(lambda e, i: e.reshape(-1)[i])(
            out.tl_embs[s][..., 0], tl_idx)                   # (B, G)
        be = jax.vmap(lambda e, i: e.reshape(-1)[i])(
            out.br_embs[s][..., 0], br_idx)
        vmask = gt_valid.astype(jnp.float32)
        # ae_loss.py semantics: per-image normalization (N and N(N-1)),
        # batch-SUMMED — not the global-count normalization of a naive
        # batched port
        pull, push = L.ae_loss(te, be, gt_valid)
        # offsets at corner cells
        to = jax.vmap(lambda o, i: o.reshape(-1, 2)[i])(
            out.tl_offs[s], tl_idx)                           # (B, G, 2)
        bo = jax.vmap(lambda o, i: o.reshape(-1, 2)[i])(
            out.br_offs[s], br_idx)
        # corner_head.py:134: loss_offset is SmoothL1(beta=1.0); each
        # corner normalizes by the cell count and the pair averages /2 —
        # algebraically the 2*nv avg_factor used here
        woff = jnp.repeat(vmask[..., None], 2, -1)
        off = L.smooth_l1_loss(
            to.reshape(-1, 2), tl_off_t.reshape(-1, 2), beta=1.0,
            weight=woff.reshape(-1, 2), avg_factor=2 * nv) \
            + L.smooth_l1_loss(
            bo.reshape(-1, 2), br_off_t.reshape(-1, 2), beta=1.0,
            weight=woff.reshape(-1, 2), avg_factor=2 * nv)
        pre = "" if s == len(out.tl_heats) - 1 else f"s{s}."
        losses[pre + "loss_heatmap"] = det
        losses[pre + "loss_pull"] = cfg.pull_weight * pull
        losses[pre + "loss_push"] = cfg.push_weight * push
        losses[pre + "loss_offset"] = cfg.off_weight * off
    return losses


def cornernet_get_bboxes(out: CornerHeadOutputs, img_hw, k: int = 100,
                         max_per_img: int = 100, score_thr: float = 0.05,
                         emb_thr: float = 0.5, stride: int = 4,
                         scale_factor=None, rescale: bool = False):
    """Pair-and-score decode from the LAST stack."""
    tl_heat = jax.nn.sigmoid(out.tl_heats[-1])
    br_heat = jax.nn.sigmoid(out.br_heats[-1])
    B, H, W, C = tl_heat.shape

    def nms_pool(x):
        m = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
            "SAME")
        return jnp.where(m == x, x, 0.0)

    def decode_one(tlh, brh, tle, bre, tlo, bro, hw, sf):
        def topk(heat):
            flat = heat.reshape(-1)                     # (H*W*C,)
            sc, idx = jax.lax.top_k(flat, k)
            cls = idx % C
            cell = idx // C
            ys = (cell // W).astype(jnp.float32)
            xs = (cell % W).astype(jnp.float32)
            return sc, cls, cell, ys, xs

        tsc, tcls, tcell, tys, txs = topk(tlh)
        bsc, bcls, bcell, bys, bxs = topk(brh)
        te = tle.reshape(-1)[tcell]
        be = bre.reshape(-1)[bcell]
        to = tlo.reshape(-1, 2)[tcell]
        bo = bro.reshape(-1, 2)[bcell]
        tx = (txs + to[:, 0]) * stride
        ty = (tys + to[:, 1]) * stride
        bx = (bxs + bo[:, 0]) * stride
        by = (bys + bo[:, 1]) * stride

        scores = (tsc[:, None] + bsc[None, :]) / 2      # (k, k)
        ok = (tcls[:, None] == bcls[None, :])
        ok &= (bx[None, :] > tx[:, None]) & (by[None, :] > ty[:, None])
        ok &= jnp.abs(te[:, None] - be[None, :]) < emb_thr
        scores = jnp.where(ok, scores, -1.0)

        flat = scores.reshape(-1)
        # soft-NMS pool, then gaussian decay to max_per_img (test_cfg
        # nms=soft_nms gaussian — configs/cornernet)
        pool = min(10 * max_per_img, k * k)
        sc, idx = jax.lax.top_k(flat, pool)
        ti = idx // k
        bi = idx % k
        boxes = jnp.stack([tx[ti], ty[ti], bx[bi], by[bi]], -1)
        hh = hw[0].astype(jnp.float32)
        ww = hw[1].astype(jnp.float32)
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, ww), jnp.clip(boxes[:, 1], 0, hh),
            jnp.clip(boxes[:, 2], 0, ww), jnp.clip(boxes[:, 3], 0, hh)],
            -1)
        labels = tcls[ti]
        boxes, sc, labels, keep = soft_nms(
            boxes, sc, labels, max_per_img, valid=sc > 0)
        if rescale and sf is not None:
            boxes = boxes / sf[None]
        valid = keep & (sc > score_thr)
        return boxes, sc, labels, valid

    if scale_factor is None:
        scale_factor = jnp.ones((B, 4), jnp.float32)
    nb, ns, nl, valid = jax.vmap(decode_one)(
        nms_pool(tl_heat), nms_pool(br_heat), out.tl_embs[-1],
        out.br_embs[-1], out.tl_offs[-1], out.br_offs[-1], img_hw,
        scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=valid)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        return CornerNet(num_classes=cfg.model.num_classes)

    def losses(model, cfg, **_):
        det_cfg = CornerLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            # hourglass BN trains (reference cornernet: no norm_eval)
            out, mutated = model.apply(
                variables, batch.images, batch.img_hw, deterministic=False,
                mutable=["batch_stats"])
            return cornernet_loss(out.head, batch.gt_bboxes,
                                  batch.gt_labels, batch.gt_valid,
                                  det_cfg), mutated["batch_stats"]
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            d = cornernet_get_bboxes(out.head, img_hw,
                                     scale_factor=scale_factors,
                                     score_thr=max(score_thr, 0.05),
                                     max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("cornernet", build=build, losses=losses,
                    eval_step=eval_step)


_register()

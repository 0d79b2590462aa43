"""CentripetalNet (parity: mmdet dense_heads/centripetal_head.py +
configs/centripetalnet, box AP 44.9 hourglass-104).

CornerNet's embedding matching replaced by geometry: each corner predicts
  * a GUIDING shift (corner -> center, feature units; SmoothL1 0.05 at
    GT corner cells) that drives a DCN feature adaption of the pooled
    features (offsets from the detached guiding shift);
  * a CENTRIPETAL shift trained in LOG space against log(center - side)
    (SmoothL1 1.0) — at decode, tl + exp(shift) and br - exp(shift) must
    BOTH land inside the candidate box's central region for the pair to
    survive (replacing embedding-distance gating).
Heatmaps/offsets and their targets are CornerNet's (models/cornernet.py).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.postprocess import soft_nms
from ..ops.deform_conv import deform_conv2d
from .cornernet import (CascadeCornerPool, CornerLossConfig, _pred_branch,
                        corner_targets)
from .hourglass import HourglassNet


class CentripetalHeadOutputs(NamedTuple):
    tl_heats: Tuple[jnp.ndarray, ...]
    br_heats: Tuple[jnp.ndarray, ...]
    tl_offs: Tuple[jnp.ndarray, ...]
    br_offs: Tuple[jnp.ndarray, ...]
    tl_guiding: Tuple[jnp.ndarray, ...]     # (B, H, W, 2) (dx, dy)
    br_guiding: Tuple[jnp.ndarray, ...]
    tl_centripetal: Tuple[jnp.ndarray, ...]  # (B, H, W, 2) log shifts
    br_centripetal: Tuple[jnp.ndarray, ...]


class CentripetalNetOutputs(NamedTuple):
    head: CentripetalHeadOutputs
    neck_feats: Tuple[jnp.ndarray, ...]


class CentripetalHead(nn.Module):
    num_classes: int = 80
    num_stacks: int = 2

    @nn.compact
    def __call__(self, feats, deterministic: bool = True):
        outs = {k: [] for k in ("tlh", "brh", "tlo", "bro", "tlg", "brg",
                                "tlc", "brc")}
        for i, f in enumerate(feats):
            tl = CascadeCornerPool(("top", "left"), name=f"tl_pool{i}")(
                f, deterministic)
            br = CascadeCornerPool(("bottom", "right"),
                                   name=f"br_pool{i}")(f, deterministic)
            outs["tlh"].append(_pred_branch(tl, self.num_classes,
                                            f"tl_heat{i}", bias_cls=True))
            outs["brh"].append(_pred_branch(br, self.num_classes,
                                            f"br_heat{i}", bias_cls=True))
            outs["tlo"].append(_pred_branch(tl, 2, f"tl_off{i}"))
            outs["bro"].append(_pred_branch(br, 2, f"br_off{i}"))
            for tag, pooled in (("tl", tl), ("br", br)):
                g = _pred_branch(pooled, 2, f"{tag}_guiding{i}")
                # init parity (centripetal_head.py:146-147): the dcn
                # offset conv is Normal(std=0.1), not zero-initialized
                off = nn.Conv(18, (1, 1),
                              kernel_init=nn.initializers.normal(0.1),
                              bias_init=nn.initializers.zeros,
                              name=f"{tag}_dcn_offset{i}")(
                    jax.lax.stop_gradient(g))
                w = self.param(f"{tag}_adaption_kernel{i}",
                               nn.initializers.normal(0.01),
                               (3, 3, pooled.shape[-1], 256))
                adapted = nn.relu(deform_conv2d(pooled, off, w))
                c = _pred_branch(adapted, 2, f"{tag}_centripetal{i}")
                outs[f"{tag}g"].append(g)
                outs[f"{tag}c"].append(c)
        return CentripetalHeadOutputs(
            tuple(outs["tlh"]), tuple(outs["brh"]), tuple(outs["tlo"]),
            tuple(outs["bro"]), tuple(outs["tlg"]), tuple(outs["brg"]),
            tuple(outs["tlc"]), tuple(outs["brc"]))


class CentripetalNet(nn.Module):
    num_classes: int = 80
    num_stacks: int = 2

    @nn.compact
    def __call__(self, images, img_hw, deterministic: bool = True):
        feats = HourglassNet(num_stacks=self.num_stacks,
                             name="backbone")(images, deterministic)
        head = CentripetalHead(num_classes=self.num_classes,
                               num_stacks=self.num_stacks,
                               name="bbox_head")(feats, deterministic)
        return CentripetalNetOutputs(head, feats)


class CentripetalLossConfig(NamedTuple):
    num_classes: int = 80
    off_weight: float = 1.0
    guiding_weight: float = 0.05
    centripetal_weight: float = 1.0


def _shift_targets(gt_bboxes, gt_valid, h, w, stride: int = 4):
    """Per image: guiding (corner -> center, feature units) and
    centripetal (log(center - side)) targets at the integer corner cells.

    Returns (tl_g, br_g, tl_c, br_c): each (G, 2)."""
    fb = gt_bboxes / stride
    cx = (fb[:, 0] + fb[:, 2]) / 2
    cy = (fb[:, 1] + fb[:, 3]) / 2
    itlx = jnp.clip(jnp.floor(fb[:, 0]), 0, w - 1)
    itly = jnp.clip(jnp.floor(fb[:, 1]), 0, h - 1)
    ibrx = jnp.clip(jnp.floor(fb[:, 2]), 0, w - 1)
    ibry = jnp.clip(jnp.floor(fb[:, 3]), 0, h - 1)
    tl_g = jnp.stack([cx - itlx, cy - itly], -1)
    br_g = jnp.stack([ibrx - cx, ibry - cy], -1)
    eps = 1e-4
    tl_c = jnp.log(jnp.clip(
        jnp.stack([cx - fb[:, 0], cy - fb[:, 1]], -1), eps))
    br_c = jnp.log(jnp.clip(
        jnp.stack([fb[:, 2] - cx, fb[:, 3] - cy], -1), eps))
    return tl_g, br_g, tl_c, br_c


def centripetalnet_loss(out: CentripetalHeadOutputs, gt_bboxes, gt_labels,
                        gt_valid, cfg: CentripetalLossConfig
                        ) -> Dict[str, jnp.ndarray]:
    B = out.tl_heats[0].shape[0]
    C = cfg.num_classes
    h, w = out.tl_heats[0].shape[1:3]
    tgt = jax.vmap(lambda b, l, v: corner_targets(b, l, v, h, w, C))(
        gt_bboxes, gt_labels, gt_valid)
    tl_heat_t, br_heat_t, tl_off_t, br_off_t, tl_idx, br_idx = tgt
    sg, bg, sc, bc = jax.vmap(
        lambda b, v: _shift_targets(b, v, h, w))(gt_bboxes, gt_valid)
    nv = jnp.maximum(gt_valid.sum().astype(jnp.float32), 1.0)
    vmask = gt_valid.astype(jnp.float32)
    woff = jnp.repeat(vmask[..., None], 2, -1)

    losses = {}
    for s in range(len(out.tl_heats)):
        det = 0.0
        for heat, heat_t in ((out.tl_heats[s], tl_heat_t),
                             (out.br_heats[s], br_heat_t)):
            p = jnp.clip(jax.nn.sigmoid(heat), 1e-4, 1 - 1e-4)
            det = det + L.gaussian_focal_loss(
                p.reshape(-1), heat_t.reshape(-1), avg_factor=nv)
        det = det / 2.0             # corner_head.py:621 (tl + br) / 2

        def at(maps, idx):
            return jax.vmap(lambda m, i: m.reshape(-1, 2)[i])(maps, idx)

        # loss_offset is SmoothL1(beta=1) inherited from corner_head
        off = L.smooth_l1_loss(
            at(out.tl_offs[s], tl_idx).reshape(-1, 2),
            tl_off_t.reshape(-1, 2), beta=1.0, weight=woff.reshape(-1, 2),
            avg_factor=2 * nv) + L.smooth_l1_loss(
            at(out.br_offs[s], br_idx).reshape(-1, 2),
            br_off_t.reshape(-1, 2), beta=1.0, weight=woff.reshape(-1, 2),
            avg_factor=2 * nv)
        guide = L.smooth_l1_loss(
            at(out.tl_guiding[s], tl_idx).reshape(-1, 2),
            sg.reshape(-1, 2), weight=woff.reshape(-1, 2),
            avg_factor=2 * nv) + L.smooth_l1_loss(
            at(out.br_guiding[s], br_idx).reshape(-1, 2),
            bg.reshape(-1, 2), weight=woff.reshape(-1, 2),
            avg_factor=2 * nv)
        centr = L.smooth_l1_loss(
            at(out.tl_centripetal[s], tl_idx).reshape(-1, 2),
            sc.reshape(-1, 2), weight=woff.reshape(-1, 2),
            avg_factor=2 * nv) + L.smooth_l1_loss(
            at(out.br_centripetal[s], br_idx).reshape(-1, 2),
            bc.reshape(-1, 2), weight=woff.reshape(-1, 2),
            avg_factor=2 * nv)
        pre = "" if s == len(out.tl_heats) - 1 else f"s{s}."
        losses[pre + "loss_heatmap"] = det
        losses[pre + "loss_offset"] = cfg.off_weight * off
        losses[pre + "loss_guiding"] = cfg.guiding_weight * guide
        losses[pre + "loss_centripetal"] = cfg.centripetal_weight * centr
    return losses


def centripetalnet_get_bboxes(out: CentripetalHeadOutputs, img_hw,
                              k: int = 100, max_per_img: int = 100,
                              score_thr: float = 0.05, stride: int = 4,
                              scale_factor=None, rescale: bool = False):
    """CornerNet pair decode with centripetal gating: both shifted centers
    must land in the candidate box's central third."""
    tl_heat = jax.nn.sigmoid(out.tl_heats[-1])
    br_heat = jax.nn.sigmoid(out.br_heats[-1])
    B, H, W, C = tl_heat.shape

    def nms_pool(x):
        m = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                  (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
        return jnp.where(m == x, x, 0.0)

    def decode_one(tlh, brh, tlo, bro, tlc, brc, hw, sf):
        def topk(heat):
            sc, idx = jax.lax.top_k(heat.reshape(-1), k)
            cls = idx % C
            cell = idx // C
            return sc, cls, (cell // W).astype(jnp.float32), \
                (cell % W).astype(jnp.float32), cell

        tsc, tcls, tys, txs, tcell = topk(tlh)
        bsc, bcls, bys, bxs, bcell = topk(brh)
        to = tlo.reshape(-1, 2)[tcell]
        bo = bro.reshape(-1, 2)[bcell]
        tshift = jnp.exp(tlc.reshape(-1, 2)[tcell])    # toward center (+)
        bshift = jnp.exp(brc.reshape(-1, 2)[bcell])    # toward center (-)
        tx = txs + to[:, 0]
        ty = tys + to[:, 1]
        bx = bxs + bo[:, 0]
        by = bys + bo[:, 1]
        tctx = tx + tshift[:, 0]
        tcty = ty + tshift[:, 1]
        bctx = bx - bshift[:, 0]
        bcty = by - bshift[:, 1]

        scores = (tsc[:, None] + bsc[None, :]) / 2
        ok = (tcls[:, None] == bcls[None, :])
        ok &= (bx[None, :] > tx[:, None]) & (by[None, :] > ty[:, None])
        # central-region gate (corner_head.py:951-977): region = center
        # +- mu*wh/2 with mu = 1/2.4, shrunk to 1/2.1 for boxes with
        # input-resolution area > 3500 ("magic nums from paper sec 4.1");
        # both shifted centers must land STRICTLY inside
        cw = bx[None, :] - tx[:, None]
        ch = by[None, :] - ty[:, None]
        area_in = (cw * ch) * float(stride * stride)
        mu = jnp.where(area_in > 3500.0, 1 / 2.1, 1 / 2.4)
        cx_c = (tx[:, None] + bx[None, :]) / 2
        cy_c = (ty[:, None] + by[None, :]) / 2
        lo_x = cx_c - mu * cw / 2
        hi_x = cx_c + mu * cw / 2
        lo_y = cy_c - mu * ch / 2
        hi_y = cy_c + mu * ch / 2
        for ctx, cty in ((tctx[:, None], tcty[:, None]),
                         (bctx[None, :], bcty[None, :])):
            ok &= (ctx > lo_x) & (ctx < hi_x) \
                & (cty > lo_y) & (cty < hi_y)
        scores = jnp.where(ok, scores, -1.0)

        # soft-NMS pool, then gaussian decay to max_per_img (test_cfg
        # nms=soft_nms gaussian — configs/centripetalnet)
        pool = min(10 * max_per_img, k * k)
        sc, idx = jax.lax.top_k(scores.reshape(-1), pool)
        ti = idx // k
        bi = idx % k
        boxes = jnp.stack([tx[ti], ty[ti], bx[bi], by[bi]], -1) * stride
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
        return boxes, sc, labels, keep & (sc > score_thr)

    if scale_factor is None:
        scale_factor = jnp.ones((B, 4), jnp.float32)
    nb, ns, nl, valid = jax.vmap(decode_one)(
        nms_pool(tl_heat), nms_pool(br_heat), out.tl_offs[-1],
        out.br_offs[-1], out.tl_centripetal[-1], out.br_centripetal[-1],
        img_hw, scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=valid)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        return CentripetalNet(num_classes=cfg.model.num_classes)

    def losses(model, cfg, **_):
        det_cfg = CentripetalLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out, mutated = model.apply(
                variables, batch.images, batch.img_hw, deterministic=False,
                mutable=["batch_stats"])
            return centripetalnet_loss(
                out.head, batch.gt_bboxes, batch.gt_labels,
                batch.gt_valid, det_cfg), mutated["batch_stats"]
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            d = centripetalnet_get_bboxes(
                out.head, img_hw, scale_factor=scale_factors,
                score_thr=max(score_thr, 0.05),
                max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("centripetalnet", build=build, losses=losses,
                    eval_step=eval_step)


_register()

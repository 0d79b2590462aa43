"""RetinaNet (parity: mmdet retinanet_r50_fpn — detectors/retinanet.py +
dense_heads/retina_head.py + configs/retinanet/*_r50_fpn_1x_coco.py).

ResNet + FPN (P3-P7, extra convs on INPUT per the retina config) + a
shared 4-conv-stack head with A = 3 scales x 3 ratios anchors per cell,
focal-loss classification (prior-prob 0.01 bias init) and L1 on
delta-encoded boxes under MaxIoU assignment (pos 0.5 / neg 0.4).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core import losses as L
from ..core.anchors import base_anchors, bbox2delta, delta2bbox, grid_anchors
from ..core.max_iou_assigner import max_iou_assign
from ..core.postprocess import batched_nms, filter_scores_and_topk, \
    filter_scores_and_topk_mlvl
from .fpn import FPN
from .gfl_detr_head import bias_init_with_prob
from .resnet import ResNet

STRIDES = (8, 16, 32, 64, 128)
OCTAVE_BASE_SCALE = 4
SCALES_PER_OCTAVE = 3
RATIOS = (0.5, 1.0, 2.0)


class RetinaHeadOutputs(NamedTuple):
    cls_scores: Tuple[jnp.ndarray, ...]   # per level (B, H, W, A*C)
    bbox_preds: Tuple[jnp.ndarray, ...]   # per level (B, H, W, A*4)


class RetinaNetOutputs(NamedTuple):
    head: RetinaHeadOutputs
    neck_feats: Tuple[jnp.ndarray, ...]


class RetinaHead(nn.Module):
    """``sepbn``: RetinaSepBNHead (retina_sepbn_head.py, the NAS-FPN
    companion) — conv WEIGHTS stay shared across levels but each level
    keeps its own BatchNorm statistics."""
    num_classes: int = 80
    stacked_convs: int = 4
    feat_channels: int = 256
    sepbn: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray],
                 train: bool = False) -> RetinaHeadOutputs:
        A = SCALES_PER_OCTAVE * len(RATIOS)
        # init parity (retina_head.py:41-48): head convs Normal(std=0.01),
        # retina_cls bias at prior prob 0.01
        n01 = nn.initializers.normal(0.01)
        convs = {}
        # weights shared across levels (retina_head: one head, all levels)
        for i in range(self.stacked_convs):
            convs[f"cls_conv{i}"] = nn.Conv(
                self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                use_bias=not self.sepbn, kernel_init=n01,
                name=f"cls_conv{i}")
            convs[f"reg_conv{i}"] = nn.Conv(
                self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                use_bias=not self.sepbn, kernel_init=n01,
                name=f"reg_conv{i}")
        bns = {}
        if self.sepbn:
            for lvl in range(len(feats)):
                for i in range(self.stacked_convs):
                    for p in ("cls", "reg"):
                        # torch BN momentum 0.1 == flax momentum 0.9
                        # (running = m*running + (1-m)*batch here)
                        bns[f"{p}{i}_l{lvl}"] = nn.BatchNorm(
                            use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name=f"{p}_bn{i}_lvl{lvl}")
        retina_cls = nn.Conv(
            A * self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=n01,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="retina_cls")
        retina_reg = nn.Conv(A * 4, (3, 3), padding=[(1, 1), (1, 1)],
                             kernel_init=n01, name="retina_reg")

        cls_out, reg_out = [], []
        for lvl, f in enumerate(feats):
            c = r = f
            for i in range(self.stacked_convs):
                c = convs[f"cls_conv{i}"](c)
                r = convs[f"reg_conv{i}"](r)
                if self.sepbn:
                    c = bns[f"cls{i}_l{lvl}"](c)
                    r = bns[f"reg{i}_l{lvl}"](r)
                c = nn.relu(c)
                r = nn.relu(r)
            cls_out.append(retina_cls(c))
            reg_out.append(retina_reg(r))
        return RetinaHeadOutputs(tuple(cls_out), tuple(reg_out))


class RetinaNet(nn.Module):
    """``backbone`` spec (models/backbones.py): '' = ResNet(depth); the
    reference zoo pairings retinanet_regnetx-3.2GF_fpn / retinanet_effb3
    map to 'regnetx_3.2gf' / 'effb3'."""
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = 1
    backbone: str = ""
    # 'fpn' (default), 'fpg' (necks/fpg.py feature pyramid grids) or
    # 'nasfpn' (searched merge DAG + RetinaSepBNHead, configs/nas_fpn/
    # retinanet_r50_nasfpn_crop640_50e_coco.py)
    neck: str = "fpn"
    # GHM (configs/ghm/retinanet_ghm_r50_fpn_1x_coco.py): the GHMC/GHMR
    # momentum EMAs over bin counts are cross-step state — declared here
    # as batch_stats variables so they ride the existing mutable-state
    # plumbing (train/family.py reads + writes them around the loss).
    ghm: bool = False
    ghm_c_bins: int = 30
    ghm_r_bins: int = 10

    @nn.compact
    def __call__(self, images: jnp.ndarray, img_hw: jnp.ndarray,
                 deterministic: bool = True) -> RetinaNetOutputs:
        from .backbones import build_backbone
        if self.ghm:
            self.variable("batch_stats", "ghm_acc_c",
                          lambda: jnp.zeros((self.ghm_c_bins,), jnp.float32))
            self.variable("batch_stats", "ghm_acc_r",
                          lambda: jnp.zeros((self.ghm_r_bins,), jnp.float32))
        effb = self.backbone.startswith("effb")
        # retinanet_effb3_fpn_crop896 recipe: drop_path 0.2, frozen_stages=0
        # (nothing frozen), BN trained — backbone AND neck
        bb, kind = build_backbone(self.backbone, self.depth,
                                  0 if effb else self.frozen_stages,
                                  drop_path_rate=0.2 if effb else 0.0)
        # effb/swin/pvt thread stochastic depth (drop_path) at train
        from .backbones import apply_backbone
        feats = apply_backbone(bb, self.backbone, images, deterministic)
        if self.neck == "fpg":
            from .fpg import FPG
            neck = FPG(out_channels=256, num_outs=5, name="neck")(feats)
        elif self.neck == "nasfpn":
            from .nas_fpn import NASFPN
            neck = NASFPN(out_channels=256, num_outs=5, stack_times=7,
                          name="neck")(feats)
        elif kind == "hr":
            from .hrnet import HRFPN
            neck = HRFPN(out_channels=256, num_outs=5, name="neck")(feats)
        else:
            # effb neck recipe (retinanet_effb3...py): ReLU before the
            # second extra conv, BN on every non-lateral FPN conv
            neck = FPN(out_channels=256, num_outs=5,
                       start_level=1 if kind == "c2345" else 0,
                       add_extra_convs="on_input",
                       relu_before_extra_convs=effb,
                       norm="bn" if effb else "",
                       no_norm_on_lateral=effb,
                       name="neck")(feats, train=not deterministic)
        # RetinaSepBNHead pairs with NAS-FPN AND the EfficientNet recipe
        # (configs/efficientnet/retinanet_effb3...py:29 RetinaSepBNHead)
        head = RetinaHead(num_classes=self.num_classes,
                          sepbn=(self.neck == "nasfpn"
                                 or self.backbone.startswith("effb")),
                          name="bbox_head")(neck,
                                            train=not deterministic)
        return RetinaNetOutputs(head, neck)


def retina_anchors(featmap_sizes: Sequence[Tuple[int, int]]) -> jnp.ndarray:
    """All-level anchors, flattened (sum HWA, 4), mmdet AnchorGenerator
    (octave_base_scale 4, 3 scales/octave, ratios 0.5/1/2)."""
    scales = tuple(OCTAVE_BASE_SCALE * 2 ** (i / SCALES_PER_OCTAVE)
                   for i in range(SCALES_PER_OCTAVE))
    per_level = []
    for (h, w), stride in zip(featmap_sizes, STRIDES):
        base = base_anchors(stride, scales, RATIOS)
        per_level.append(grid_anchors((h, w), stride, base))
    return jnp.concatenate(per_level, axis=0)


class RetinaLossConfig(NamedTuple):
    num_classes: int = 80
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.0
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    # GHM variant (configs/ghm/retinanet_ghm_r50_fpn_1x_coco.py):
    # GHMC(bins=30, momentum=0.75) + GHMR(mu=0.02, bins=10, momentum=0.7,
    # loss_weight=10) replacing Focal + L1
    ghm: bool = False
    ghm_c_bins: int = 30
    ghm_c_momentum: float = 0.75
    ghm_r_mu: float = 0.02
    ghm_r_bins: int = 10
    ghm_r_momentum: float = 0.7


def retina_detection_loss(out: RetinaHeadOutputs, anchors, gt_bboxes,
                          gt_labels, gt_valid, cfg: RetinaLossConfig,
                          pisa: bool = False, ghm_state=None):
    """Batched RetinaNet loss (retina config: FocalLoss + L1 on deltas,
    MaxIoU pos 0.5 / neg 0.4 / min_pos_iou 0, all anchors sampled).

    ``pisa``: apply ISR-P importance reweighting to the cls loss and add
    the CARL classification-aware regression term
    (dense_heads/pisa_retinanet_head.py; models/pisa.py).

    ``cfg.ghm``: GHM-C/GHM-R replace Focal/L1, applied PER FPN LEVEL with
    a shared EMA (mmdet's AnchorHead.loss maps loss_single over levels,
    so one GHMC/GHMR module's acc_sum is updated once per level per step,
    and the per-level means are summed by parse_losses). ``ghm_state`` is
    the {'acc_c', 'acc_r'} EMA dict; returns (losses, new_ghm_state)."""
    B = out.cls_scores[0].shape[0]
    C = cfg.num_classes
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], axis=1)
    deltas = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], axis=1)

    assign = jax.vmap(
        lambda b, l, v: max_iou_assign(
            anchors, b, l, v, C, pos_iou_thr=cfg.pos_iou_thr,
            neg_iou_thr=cfg.neg_iou_thr, min_pos_iou=0.0))(
        gt_bboxes, gt_labels, gt_valid)

    pos = assign.assigned_gt >= 0                       # (B, N)
    ignored = assign.assigned_gt == -2
    num_total_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

    G = gt_bboxes.shape[1]
    tgt = jnp.take_along_axis(
        gt_bboxes, jnp.clip(assign.assigned_gt, 0, G - 1)[..., None],
        axis=1)
    delta_tgt = bbox2delta(anchors[None], tgt)

    onehot = jax.nn.one_hot(assign.labels, C + 1)[..., :C]
    if cfg.ghm:
        # per-level slices of the flattened anchor axis
        sizes = [int(np.prod(c.shape[1:3])) * (len(RATIOS)
                 * SCALES_PER_OCTAVE) for c in out.cls_scores]
        acc_c, acc_r = ghm_state["acc_c"], ghm_state["acc_r"]
        lw_anchor = (~ignored).astype(jnp.float32)        # (B, N)
        pos_f = pos.astype(jnp.float32)
        loss_cls = 0.0
        loss_bbox = 0.0
        start = 0
        for S in sizes:
            sl = slice(start, start + S)
            start += S
            lc, acc_c = L.ghm_c_loss(
                cls_flat[:, sl].reshape(-1, C),
                onehot[:, sl].reshape(-1, C),
                jnp.broadcast_to(lw_anchor[:, sl].reshape(-1, 1),
                                 (B * S, C)),
                bins=cfg.ghm_c_bins, momentum=cfg.ghm_c_momentum,
                acc_sum=acc_c)
            lr, acc_r = L.ghm_r_loss(
                deltas[:, sl].reshape(-1, 4),
                delta_tgt[:, sl].reshape(-1, 4),
                jnp.broadcast_to(pos_f[:, sl].reshape(-1, 1), (B * S, 4)),
                mu=cfg.ghm_r_mu, bins=cfg.ghm_r_bins,
                momentum=cfg.ghm_r_momentum, acc_sum=acc_r)
            loss_cls = loss_cls + lc
            loss_bbox = loss_bbox + lr
        losses = dict(loss_cls=cfg.loss_cls_weight * loss_cls,
                      loss_bbox=cfg.loss_bbox_weight * loss_bbox)
        return losses, {"acc_c": acc_c, "acc_r": acc_r}
    w = (~ignored).astype(jnp.float32).reshape(-1)
    if pisa:
        from .pisa import isr_p_weights
        N = cls_flat.shape[1]
        anchors_flat = jnp.broadcast_to(anchors[None], (B, N, 4))
        gt_off = assign.assigned_gt + jnp.arange(B)[:, None] * G
        imp = isr_p_weights(
            jax.lax.stop_gradient(cls_flat.reshape(-1, C)),
            jax.lax.stop_gradient(deltas.reshape(-1, 4)),
            anchors_flat.reshape(-1, 4), assign.labels.reshape(-1),
            pos.reshape(-1), gt_off.reshape(-1),
            jax.lax.stop_gradient(delta_tgt.reshape(-1, 4)), C)
        w = w * jax.lax.stop_gradient(imp)
    loss_cls = cfg.loss_cls_weight * L.sigmoid_focal_loss(
        cls_flat.reshape(-1, C), onehot.reshape(-1, C),
        weight=w.reshape(-1, 1), avg_factor=num_total_pos,
        gamma=cfg.focal_gamma, alpha=cfg.focal_alpha)

    loss_bbox = cfg.loss_bbox_weight * L.l1_loss(
        deltas.reshape(-1, 4), delta_tgt.reshape(-1, 4),
        weight=pos.astype(jnp.float32).reshape(-1, 1),
        avg_factor=num_total_pos)
    losses = dict(loss_cls=loss_cls, loss_bbox=loss_bbox)
    if pisa:
        from .pisa import carl_loss
        losses["loss_carl"] = carl_loss(
            cls_flat.reshape(-1, C), assign.labels.reshape(-1),
            pos.reshape(-1), deltas.reshape(-1, 4),
            jax.lax.stop_gradient(delta_tgt.reshape(-1, 4)),
            num_total_pos, C)
    return losses


def retina_get_bboxes(out: RetinaHeadOutputs, anchors, img_hw,
                      scale_factor=None, score_thr: float = 0.05,
                      nms_iou: float = 0.5, nms_pre: int = 1000,
                      max_per_img: int = 100, rescale: bool = False,
                      delta_stds=(1.0, 1.0, 1.0, 1.0)):
    """Static-shape decode: per-image threshold/top-k, delta decode, clip,
    class-aware NMS (the retina test_cfg)."""
    B = out.cls_scores[0].shape[0]
    C = out.cls_scores[0].shape[-1] // (SCALES_PER_OCTAVE * len(RATIOS))
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C) for c in out.cls_scores], axis=1)
    deltas = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], axis=1)

    level_sizes = [c.shape[1] * c.shape[2] * (c.shape[3] // C)
                   for c in out.cls_scores]

    def per_image(cls_s, delta, hw, sf):
        probs = jax.nn.sigmoid(cls_s)
        # nms_pre applies PER LEVEL (the reference's
        # _get_bboxes_single loops levels)
        top = filter_scores_and_topk_mlvl(probs, score_thr,
                                          nms_pre, level_sizes)
        boxes = delta2bbox(anchors[top.keep_idxs], delta[top.keep_idxs],
                           stds=delta_stds)
        h, w = hw[0].astype(boxes.dtype), hw[1].astype(boxes.dtype)
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, w), jnp.clip(boxes[:, 1], 0, h),
            jnp.clip(boxes[:, 2], 0, w), jnp.clip(boxes[:, 3], 0, h)], -1)
        nb, ns, nl, keep, _ = batched_nms(boxes, top.scores, top.labels,
                                          nms_iou, max_per_img,
                                          valid=top.valid)
        if rescale and sf is not None:
            nb = nb / sf[None]
        return nb, ns, nl, keep

    if scale_factor is None:
        scale_factor = jnp.ones((B, 4), jnp.float32)
    nb, ns, nl, keep = jax.vmap(per_image)(cls_flat, deltas, img_hw,
                                           scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=keep)


# --- family registrations (dskd_tpu/registry.py) ------------------------

_RETINA_VARIANTS = ("retinanet", "pisa_retinanet", "retinanet_ghm",
                    "retinanet_fpg", "retinanet_nasfpn")


def _register():
    from ..registry import register_family

    def build(cfg, arch):
        m = cfg.model
        neck = {"retinanet_fpg": "fpg",
                "retinanet_nasfpn": "nasfpn"}.get(arch, "fpn")
        return RetinaNet(num_classes=m.num_classes, depth=m.depth,
                         frozen_stages=m.frozen_stages,
                         backbone=m.backbone, neck=neck,
                         ghm=(arch == "retinanet_ghm"))

    def losses(model, cfg, *, arch, **_):
        pisa = arch == "pisa_retinanet"
        # per-level BN heads: NAS-FPN and the EfficientNet recipe
        sepbn = (arch == "retinanet_nasfpn"
                 or cfg.model.backbone.startswith("effb"))
        ghm = arch == "retinanet_ghm"
        # GHM recipe swaps Focal+L1 for GHMC + GHMR(loss_weight=10)
        # (configs/ghm/retinanet_ghm_r50_fpn_1x_coco.py); the effb recipe
        # raises the assigner's neg_iou_thr 0.4 -> 0.5
        # (configs/efficientnet/retinanet_effb3...py train_cfg)
        det_cfg = RetinaLossConfig(num_classes=cfg.model.num_classes,
                                   ghm=ghm,
                                   neg_iou_thr=0.5
                                   if cfg.model.backbone.startswith("effb")
                                   else 0.4,
                                   loss_bbox_weight=10.0 if ghm else 1.0)

        # swin/pvt backbones carry stochastic depth (no BN to mutate)
        stoch_bb = cfg.model.backbone.startswith(("swin", "pvt"))

        def losses_fn(variables, batch, teacher_vars, rng):
            if sepbn:
                # RetinaSepBNHead trains its per-level BN statistics;
                # the rng feeds EfficientNet's drop_path when present
                out, mutated = model.apply(
                    variables, batch.images, batch.img_hw,
                    deterministic=False, mutable=["batch_stats"],
                    rngs={"dropout": rng})
                stats = mutated["batch_stats"]
            elif stoch_bb:
                out = model.apply(variables, batch.images, batch.img_hw,
                                  deterministic=False,
                                  rngs={"dropout": rng})
                stats = None
            else:
                out = model.apply(variables, batch.images, batch.img_hw,
                                  deterministic=True)
                stats = None
            anchors = retina_anchors(
                [c.shape[1:3] for c in out.head.cls_scores])
            if ghm:
                # thread the GHM EMA bin counts through batch_stats —
                # START from the mutable-apply stats when sepbn also ran
                # (a ghm+effb combo would otherwise discard the SepBN /
                # backbone BN updates and freeze them at init)
                bs = variables["batch_stats"]
                losses, new_ghm = retina_detection_loss(
                    out.head, anchors, batch.gt_bboxes, batch.gt_labels,
                    batch.gt_valid, det_cfg,
                    ghm_state={"acc_c": bs["ghm_acc_c"],
                               "acc_r": bs["ghm_acc_r"]})
                new_bs = dict(stats if stats is not None else bs)
                new_bs["ghm_acc_c"] = new_ghm["acc_c"]
                new_bs["ghm_acc_r"] = new_ghm["acc_r"]
                return losses, new_bs
            return retina_detection_loss(
                out.head, anchors, batch.gt_bboxes, batch.gt_labels,
                batch.gt_valid, det_cfg, pisa=pisa), stats
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            anchors = retina_anchors(
                [c.shape[1:3] for c in out.head.cls_scores])
            d = retina_get_bboxes(out.head, anchors, img_hw,
                                  scale_factor=scale_factors,
                                  score_thr=max(score_thr, 0.05),
                                  max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    for name in _RETINA_VARIANTS:
        register_family(
            name,
            build=(lambda cfg, _a=name: build(cfg, _a)),
            losses=(lambda model, cfg, _a=name, **kw:
                    losses(model, cfg, arch=_a, **kw)),
            eval_step=eval_step)


_register()

"""SSD300 / SSD512 (parity: mmdet backbones/ssd_vgg.py + necks/ssd_neck.py
extras + dense_heads/ssd_head.py + anchor SSDAnchorGenerator +
configs/ssd/ssd300_coco.py, ssd512_coco.py).

VGG-16 through conv5 + dilated fc6/fc7 convs, L2Norm on the conv4_3
output, extra stride-2 blocks -> 6 detection levels (38/19/10/5/3/1 at
300 input) or 7 levels (64/32/16/8/4/2/1 at 512; the last extra block is
the stride-1 kernel-4 conv of ssd_neck.py's ``last_kernel_size=4`` row).
Per-level anchor counts from the basesize-ratio ladder
(anchor_generator.py:506-551: SSD300 COCO range (0.15, 0.9) with the
7%/15% level-0 insert; SSD512 COCO range (0.1, 0.9) with the 4%/10%
insert); softmax CE with 3:1 HARD negative mining (loss-ranked, the
reference ssd_head.loss_single) + smooth-L1 deltas.
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

# Per-input-size tables (SSDAnchorGenerator's hard-coded ladder,
# anchor_generator.py:506-551, and ssd_vgg/ssd_neck extras). Extras rows
# are (mid, out, stride, pad, kernel).
SIZE_SPECS = {
    300: dict(
        strides=(8, 16, 32, 64, 100, 300),
        # COCO basesize_ratio_range (0.15, 0.9) + the 7%/15% insert
        min_sizes=(21, 45, 99, 153, 207, 261),
        max_sizes=(45, 99, 153, 207, 261, 315),
        ratios=((2,), (2, 3), (2, 3), (2, 3), (2,), (2,)),
        extras=((256, 512, 2, 1, 3), (128, 256, 2, 1, 3),
                (128, 256, 1, 0, 3), (128, 256, 1, 0, 3)),
    ),
    512: dict(
        strides=(8, 16, 32, 64, 128, 256, 512),
        # COCO basesize_ratio_range (0.1, 0.9): step 16 over 10..90 + the
        # 4%/10% level-0 insert -> 7 levels
        min_sizes=(20, 51, 133, 215, 296, 378, 460),
        max_sizes=(51, 133, 215, 296, 378, 460, 542),
        ratios=((2,), (2, 3), (2, 3), (2, 3), (2, 3), (2,), (2,)),
        # ssd512 neck row: out (512, 256, 256, 256, 256), strides
        # (2, 2, 2, 2, 1), paddings all 1, last kernel 4 (2x2 -> 1x1)
        extras=((256, 512, 2, 1, 3), (128, 256, 2, 1, 3),
                (128, 256, 2, 1, 3), (128, 256, 2, 1, 3),
                (128, 256, 1, 1, 4)),
    ),
    # SSDLite-MobileNetV2 (configs/ssd/ssdlite_mobilenetv2_scratch_600e):
    # explicit anchor table (no basesize derivation), MobileNetV2 taps
    # (4, 7), depthwise-separable extras + head, trainable BN throughout
    # (scratch recipe — no norm_eval)
    320: dict(
        strides=(16, 32, 64, 107, 160, 320),
        min_sizes=(48, 100, 150, 202, 253, 304),
        max_sizes=(100, 150, 202, 253, 304, 320),
        ratios=((2, 3),) * 6,
        # SSDNeck use_depthwise rows: out (512, 256, 256, 128), all
        # stride 2 / pad 1; mid = out // 2
        extras=((256, 512, 2, 1, 3), (128, 256, 2, 1, 3),
                (128, 256, 2, 1, 3), (64, 128, 2, 1, 3)),
    ),
}

# SSD300 aliases (historic module-level names)
STRIDES = SIZE_SPECS[300]["strides"]
MIN_SIZES = SIZE_SPECS[300]["min_sizes"]
MAX_SIZES = SIZE_SPECS[300]["max_sizes"]
LEVEL_RATIOS = SIZE_SPECS[300]["ratios"]


def _size_from_levels(num_levels: int) -> int:
    """The level count identifies the 512 variant (7 levels) only. SSD300
    and SSDLite-320 BOTH run 6 levels, so inferring 300 from 6 levels
    would silently decode SSDLite outputs with SSD300 anchors — callers
    must pass ``input_size`` explicitly there (the train/eval dispatchers
    thread ``ModelConfig.ssd_input_size`` through)."""
    if num_levels == 7:
        return 512
    raise ValueError(
        f"{num_levels}-level SSD outputs are ambiguous (SSD300 and "
        "SSDLite-320 both run 6 levels): pass input_size explicitly")


def ssd_level_anchors(level: int, input_size: int = 300):
    """Base anchors for one level: [1, 1'] scales x ratios (ssd_head
    anchor recipe) -> 4 or 6 anchors.

    Unlike the default AnchorGenerator (grid-corner centers),
    SSDAnchorGenerator centers every anchor at stride/2
    (anchor_generator.py:503 ``centers=[(stride/2, stride/2) ...]``) —
    the level-5 single cell is centered on the 300x300 image."""
    spec = SIZE_SPECS[input_size]
    mn, mx = spec["min_sizes"][level], spec["max_sizes"][level]
    c = spec["strides"][level] / 2.0
    boxes = []

    def box(w, h):
        boxes.append([c - w / 2, c - h / 2, c + w / 2, c + h / 2])

    box(mn, mn)
    box(float(np.sqrt(mn * mx)), float(np.sqrt(mn * mx)))
    for r in spec["ratios"][level]:
        # SSDAnchorGenerator (scale_major=False + the [0, R, 1..R-1]
        # index_select) orders each ratio pair WIDE (h/w = 1/r) before
        # TALL (h/w = r) — anchor_generator.py:553-590
        s = float(np.sqrt(r))
        box(mn * s, mn / s)
        box(mn / s, mn * s)
    return jnp.asarray(boxes, jnp.float32)


def ssd_anchors(featmap_sizes: Sequence[Tuple[int, int]],
                input_size: int = None) -> jnp.ndarray:
    if input_size is None:
        input_size = _size_from_levels(len(featmap_sizes))
    strides = SIZE_SPECS[input_size]["strides"]
    per_level = []
    for lvl, ((h, w), stride) in enumerate(zip(featmap_sizes, strides)):
        per_level.append(grid_anchors((h, w), stride,
                                      ssd_level_anchors(lvl, input_size)))
    return jnp.concatenate(per_level, axis=0)


class L2Norm(nn.Module):
    """conv4_3 channel L2 normalization with learnable per-channel scale
    (ssd_vgg.py L2Norm, init 20)."""
    init_scale: float = 20.0

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale",
                           nn.initializers.constant(self.init_scale), (c,))
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-10)
        return x / norm * scale


def _vgg_block(x, chans, n, name, pool_ceil=False):
    for i in range(n):
        x = nn.Conv(chans, (3, 3), padding=[(1, 1), (1, 1)],
                    name=f"{name}_conv{i}")(x)
        x = nn.relu(x)
    return x


class SSDOutputs(NamedTuple):
    cls_scores: Tuple[jnp.ndarray, ...]   # (B, H, W, A*(C+1)) per level
    bbox_preds: Tuple[jnp.ndarray, ...]   # (B, H, W, A*4)
    neck_feats: Tuple[jnp.ndarray, ...]


class SSDVGG(nn.Module):
    """VGG-16 trunk + SSD extras; returns the 6 (300) / 7 (512)
    detection feature maps."""
    input_size: int = 300

    @nn.compact
    def __call__(self, x):
        x = _vgg_block(x, 64, 2, "stage1")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _vgg_block(x, 128, 2, "stage2")
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _vgg_block(x, 256, 3, "stage3")
        x = nn.max_pool(x, (2, 2), strides=(2, 2), padding=((0, 1), (0, 1)))
        x = _vgg_block(x, 512, 3, "stage4")
        c43 = L2Norm(name="l2norm")(x)                 # 38x38 at 300
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _vgg_block(x, 512, 3, "stage5")
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        # fc6 (dilated) + fc7 as convs
        x = nn.relu(nn.Conv(1024, (3, 3), padding=[(6, 6), (6, 6)],
                            kernel_dilation=(6, 6), name="fc6")(x))
        x = nn.relu(nn.Conv(1024, (1, 1), name="fc7")(x))   # 19x19
        feats = [c43, x]
        # extras: conv8-conv11 (300) / conv8-conv12 incl. the final
        # kernel-4 stride-1 block (512)
        for i, (mid, out, stride, pad, k) in enumerate(
                SIZE_SPECS[self.input_size]["extras"]):
            x = nn.relu(nn.Conv(mid, (1, 1), name=f"extra{i}_1")(x))
            x = nn.relu(nn.Conv(out, (k, k), strides=(stride, stride),
                                padding=[(pad, pad), (pad, pad)],
                                name=f"extra{i}_2")(x))
            feats.append(x)
        return tuple(feats)


class SSD(nn.Module):
    num_classes: int = 80
    depth: int = 16           # VGG-16 (kept for config uniformity)
    frozen_stages: int = -1
    # 300 / 512 pick the VGG SIZE_SPECS rows; 320 is the SSDLite
    # MobileNetV2 recipe (depthwise extras + head, trainable BN)
    input_size: int = 300

    @nn.compact
    def __call__(self, images, img_hw, deterministic: bool = True,
                 train: bool = False):
        lite = self.input_size == 320
        if lite:
            from .dilated_encoder import TrainableBatchNorm
            from .mobilenet_v2 import MobileNetV2, _relu6

            # scratch-recipe norm/init (ssdlite_mobilenetv2 config:
            # norm_cfg BN(eps=1e-3, momentum=0.03 torch -> 0.97 flax),
            # backbone/neck convs TruncNormal(std=0.03))
            tn03 = nn.initializers.truncated_normal(0.03)

            def cbr(x, ch, k, stride, pad, groups, name,
                    kernel_init=None):
                x = nn.Conv(ch, (k, k), strides=(stride, stride),
                            padding=[(pad, pad), (pad, pad)],
                            feature_group_count=groups, use_bias=False,
                            kernel_init=kernel_init or tn03,
                            name=f"{name}_conv")(x)
                return _relu6(TrainableBatchNorm(
                    momentum=0.97, epsilon=1e-3,
                    name=f"{name}_bn")(x, train))

            c4, c7 = MobileNetV2(out_indices=(4, 7), train_bn=True,
                                 bn_momentum=0.97, bn_epsilon=1e-3,
                                 kernel_init=tn03,
                                 name="backbone")(images, train)
            feats = [c4, c7]
            x = c7
            for i, (mid, out_ch, stride, pad, k) in enumerate(
                    SIZE_SPECS[320]["extras"]):
                # ConvModule 1x1 -> DepthwiseSeparableConvModule
                # (ssd_neck.py:67-90, use_depthwise=True)
                x = cbr(x, mid, 1, 1, 0, 1, f"extra{i}_pw")
                x = cbr(x, mid, k, stride, pad, mid, f"extra{i}_dw")
                x = cbr(x, out_ch, 1, 1, 0, 1, f"extra{i}_proj")
                feats.append(x)
        else:
            feats = SSDVGG(name="backbone",
                           input_size=self.input_size)(images)
        ratios = SIZE_SPECS[self.input_size]["ratios"]
        cls_out, reg_out = [], []
        # ssd_head.py init_cfg: Xavier-uniform head convs, bias 0
        # (lite: Normal std=0.001 per the ssdlite init_cfg)
        init = (nn.initializers.normal(0.001) if lite
                else nn.initializers.xavier_uniform())
        for lvl, f in enumerate(feats):
            A = 2 + 2 * len(ratios[lvl])
            if lite:
                # SSD-Lite head (ssd_head.py:160-195): per-branch
                # depthwise 3x3 + BN + ReLU6, then a plain 1x1 pred conv
                c_in = f.shape[-1]
                # head init_cfg Normal(0.001) covers the depthwise
                # ConvModules too (ssdlite config bbox_head.init_cfg) —
                # NOT the backbone/neck TruncNormal(0.03)
                fc = cbr(f, c_in, 3, 1, 1, c_in, f"cls_dw{lvl}",
                         kernel_init=init)
                fr = cbr(f, c_in, 3, 1, 1, c_in, f"reg_dw{lvl}",
                         kernel_init=init)
                cls_out.append(nn.Conv(A * (self.num_classes + 1), (1, 1),
                                       kernel_init=init,
                                       name=f"cls_conv{lvl}")(fc))
                reg_out.append(nn.Conv(A * 4, (1, 1), kernel_init=init,
                                       name=f"reg_conv{lvl}")(fr))
                continue
            cls_out.append(nn.Conv(A * (self.num_classes + 1), (3, 3),
                                   padding=[(1, 1), (1, 1)],
                                   kernel_init=init,
                                   name=f"cls_conv{lvl}")(f))
            reg_out.append(nn.Conv(A * 4, (3, 3),
                                   padding=[(1, 1), (1, 1)],
                                   kernel_init=init,
                                   name=f"reg_conv{lvl}")(f))
        return SSDOutputs(tuple(cls_out), tuple(reg_out), feats)


class SSDLossConfig(NamedTuple):
    num_classes: int = 80
    neg_pos_ratio: int = 3
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    smoothl1_beta: float = 1.0
    target_stds: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)


def ssd_detection_loss(out: SSDOutputs, anchors, gt_bboxes, gt_labels,
                       gt_valid, cfg: SSDLossConfig, pisa: bool = False):
    """Softmax CE with 3:1 hard negative mining + smooth L1
    (ssd_head.loss_single: negatives ranked by their CE loss).

    ``pisa``: ISR-P importance reweighting of the positive cls weights +
    the CARL softmax-weighted regression term
    (dense_heads/pisa_ssd_head.py; models/pisa.py)."""
    B = out.cls_scores[0].shape[0]
    C = cfg.num_classes
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, C + 1) for c in out.cls_scores], axis=1)
    deltas = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], axis=1)
    N = anchors.shape[0]

    assign = jax.vmap(
        lambda b, l, v: max_iou_assign(
            anchors, b, l, v, C, pos_iou_thr=cfg.pos_iou_thr,
            neg_iou_thr=cfg.neg_iou_thr, min_pos_iou=0.0))(
        gt_bboxes, gt_labels, gt_valid)
    pos = assign.assigned_gt >= 0                      # (B, N)
    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

    ce = L.cross_entropy_loss(cls_flat.reshape(-1, C + 1),
                              assign.labels.reshape(-1),
                              reduction="none").reshape(B, N)
    # hard negative mining per image: top (ratio * num_pos_i) negatives
    neg = assign.assigned_gt == -1
    neg_rank = jnp.argsort(jnp.argsort(
        jnp.where(neg, -ce, jnp.inf), axis=1), axis=1)   # rank by loss desc
    num_neg = jnp.minimum(cfg.neg_pos_ratio * pos.sum(axis=1),
                          neg.sum(axis=1))               # (B,)
    keep_neg = neg & (neg_rank < num_neg[:, None])
    w = (pos | keep_neg).astype(jnp.float32)

    G = gt_bboxes.shape[1]
    tgt = jnp.take_along_axis(
        gt_bboxes, jnp.clip(assign.assigned_gt, 0, G - 1)[..., None],
        axis=1)
    delta_tgt = bbox2delta(anchors[None], tgt, stds=cfg.target_stds)

    if pisa:
        from .pisa import isr_p_weights
        anchors_flat = jnp.broadcast_to(anchors[None], (B, N, 4))
        gt_off = assign.assigned_gt + jnp.arange(B)[:, None] * G
        imp = isr_p_weights(
            jax.lax.stop_gradient(cls_flat.reshape(-1, C + 1)),
            jax.lax.stop_gradient(deltas.reshape(-1, 4)),
            anchors_flat.reshape(-1, 4), assign.labels.reshape(-1),
            pos.reshape(-1), gt_off.reshape(-1),
            jax.lax.stop_gradient(delta_tgt.reshape(-1, 4)), C,
            loss_kind="ce", target_stds=cfg.target_stds)
        w = w * jax.lax.stop_gradient(imp).reshape(B, N)
    loss_cls = (ce * w).sum() / num_pos

    loss_bbox = L.smooth_l1_loss(
        deltas.reshape(-1, 4), delta_tgt.reshape(-1, 4),
        beta=cfg.smoothl1_beta,
        weight=pos.astype(jnp.float32).reshape(-1, 1), avg_factor=num_pos)
    losses = dict(loss_cls=loss_cls, loss_bbox=loss_bbox)
    if pisa:
        from .pisa import carl_loss
        losses["loss_carl"] = carl_loss(
            cls_flat.reshape(-1, C + 1), assign.labels.reshape(-1),
            pos.reshape(-1), deltas.reshape(-1, 4),
            jax.lax.stop_gradient(delta_tgt.reshape(-1, 4)),
            num_pos, C, sigmoid=False,
            loss_bbox=lambda p, t, reduction: L.smooth_l1_loss(
                p, t, beta=1.0, reduction=reduction))
    return losses


def ssd_get_bboxes(out: SSDOutputs, anchors, img_hw, scale_factor=None,
                   score_thr: float = 0.02, nms_iou: float = 0.45,
                   nms_pre: int = 1000, max_per_img: int = 200,
                   rescale: bool = False,
                   target_stds=(0.1, 0.1, 0.2, 0.2),
                   input_size: int = None):
    B = out.cls_scores[0].shape[0]
    if input_size is None:
        input_size = _size_from_levels(len(out.cls_scores))
    ratios = SIZE_SPECS[input_size]["ratios"]
    Cp1 = out.cls_scores[0].shape[-1] // (2 + 2 * len(ratios[0]))
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, Cp1) for c in out.cls_scores], axis=1)
    deltas = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in out.bbox_preds], axis=1)

    level_sizes = [c.shape[1] * c.shape[2] * (c.shape[3] // Cp1)
                   for c in out.cls_scores]

    def per_image(cls_s, delta, hw, sf):
        probs = jax.nn.softmax(cls_s, -1)[:, :Cp1 - 1]  # drop background
        # nms_pre applies PER LEVEL (the reference's
        # _get_bboxes_single loops levels)
        top = filter_scores_and_topk_mlvl(probs, score_thr,
                                          nms_pre, level_sizes)
        boxes = delta2bbox(anchors[top.keep_idxs], delta[top.keep_idxs],
                           stds=target_stds)
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

def _register():
    from ..registry import register_family

    def build(cfg):
        return SSD(num_classes=cfg.model.num_classes,
                   input_size=cfg.model.ssd_input_size)

    def losses(model, cfg, *, arch, **_):
        pisa_on = arch == "pisa_ssd"
        ssd_size = cfg.model.ssd_input_size
        det_cfg = SSDLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            if ssd_size == 320:
                # SSDLite trains its MobileNetV2/extras/head BN (scratch
                # recipe, no norm_eval)
                out, mutated = model.apply(
                    variables, batch.images, batch.img_hw,
                    deterministic=True, train=True,
                    mutable=["batch_stats"])
                stats = mutated["batch_stats"]
            else:
                out = model.apply(variables, batch.images, batch.img_hw,
                                  deterministic=True)
                stats = None
            anchors = ssd_anchors([c.shape[1:3] for c in out.cls_scores],
                                  input_size=ssd_size)
            return ssd_detection_loss(out, anchors, batch.gt_bboxes,
                                      batch.gt_labels, batch.gt_valid,
                                      det_cfg, pisa=pisa_on), stats
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det
        ssd_size = getattr(model, "input_size", 300)

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            anchors = ssd_anchors([c.shape[1:3] for c in out.cls_scores],
                                  input_size=ssd_size)
            d = ssd_get_bboxes(out, anchors, img_hw,
                               scale_factor=scale_factors,
                               score_thr=max(score_thr, 0.02),
                               max_per_img=max_per_img, rescale=True,
                               input_size=ssd_size)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    for name in ("ssd", "pisa_ssd"):
        register_family(
            name, build=build,
            losses=(lambda model, cfg, _a=name, **kw:
                    losses(model, cfg, arch=_a, **kw)),
            eval_step=eval_step)


_register()

"""YOLOv3 (parity: mmdet backbones/darknet.py + necks/yolo_neck.py +
dense_heads/yolo_head.py, configs/yolo/yolov3_d53_*).

Darknet-53 (leaky-ReLU conv-BN, residual stages 1/2/8/8/4), the three-
scale detection neck (top-down 1x1 reduce + upsample + concat, 5-conv
blocks), and the YOLOv3 head: per level 3 anchors predicting
(sigmoid-xy within cell, log-wh against the anchor — core/coders.py
yolo_encode/decode), objectness and per-class BCE. Assignment: each GT's
best-IoU anchor (across all levels) is responsible; negatives with
IoU > 0.5 to any GT are ignored for objectness (the GridAssigner
neg_iou_thr contract).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core import losses as L
from ..core.boxes import bbox_overlaps
from ..core.coders import yolo_decode, yolo_encode
from ..core.postprocess import batched_nms, filter_scores_and_topk, \
    filter_scores_and_topk_mlvl
from .dilated_encoder import TrainableBatchNorm

# (w, h) anchor pairs per level, strides 32/16/8 (yolov3_d53 base config)
ANCHORS = (((116, 90), (156, 198), (373, 326)),
           ((30, 61), (62, 45), (59, 119)),
           ((10, 13), (16, 30), (33, 23)))
STRIDES = (32, 16, 8)


def _conv(x, ch, k, stride, name, train):
    pad = (k - 1) // 2
    x = nn.Conv(ch, (k, k), strides=(stride, stride),
                padding=[(pad, pad), (pad, pad)], use_bias=False,
                name=f"{name}_conv")(x)
    x = TrainableBatchNorm(name=f"{name}_bn")(x, train)
    return nn.leaky_relu(x, 0.1)


class Darknet53(nn.Module):
    """Residual stages (1, 2, 8, 8, 4); returns C3, C4, C5."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv(x, 32, 3, 1, "stem", train)
        outs = []
        for si, (ch, n) in enumerate(
                zip((64, 128, 256, 512, 1024), (1, 2, 8, 8, 4))):
            x = _conv(x, ch, 3, 2, f"down{si}", train)
            for b in range(n):
                y = _conv(x, ch // 2, 1, 1, f"s{si}b{b}_1", train)
                y = _conv(y, ch, 3, 1, f"s{si}b{b}_2", train)
                x = x + y
            if si >= 2:
                outs.append(x)
        return tuple(outs)       # C3 (s8), C4 (s16), C5 (s32)


def _block5(x, ch, name, train):
    for i, k in enumerate((1, 3, 1, 3, 1)):
        x = _conv(x, ch if k == 1 else ch * 2, k, 1, f"{name}_{i}", train)
    return x


class YOLOV3Outputs(NamedTuple):
    preds: Tuple[jnp.ndarray, ...]   # per level (B, H, W, 3*(5+C))
    neck_feats: Tuple[jnp.ndarray, ...]


class YOLOV3(nn.Module):
    num_classes: int = 80
    # '' = Darknet-53 (yolov3_d53 configs); 'mobilenet_v2' = the
    # yolov3_mobilenetv2 recipe (backbone out_indices (2, 4, 6), LeakyReLU
    # act, trainable BN, 96-channel neck/head — configs/yolo/
    # yolov3_mobilenetv2_mstrain-416_300e_coco.py)
    backbone: str = ""

    @nn.compact
    def __call__(self, images, img_hw, deterministic: bool = True,
                 train: bool = False):
        if self.backbone == "mobilenet_v2":
            from .mobilenet_v2 import MobileNetV2
            c3, c4, c5 = MobileNetV2(out_indices=(2, 4, 6), act="leaky",
                                     train_bn=True,
                                     name="backbone")(images, train)
            # YOLOV3Neck out_channels [96, 96, 96]; the head bridge conv
            # keeps 96 (yolov3_mobilenetv2: head out_channels=[96]*3)
            widths, bridge = (96, 96, 96), (96, 96, 96)
        else:
            c3, c4, c5 = Darknet53(name="backbone")(images, train)
            widths, bridge = (512, 256, 128), (1024, 512, 256)
        # neck: detect on C5; reduce+upsample+concat into C4, then C3
        d5 = _block5(c5, widths[0], "neck5", train)
        r4 = _conv(d5, widths[1], 1, 1, "reduce4", train)
        r4 = jnp.repeat(jnp.repeat(r4, 2, axis=1), 2, axis=2)
        d4 = _block5(jnp.concatenate([r4, c4], -1), widths[1], "neck4",
                     train)
        r3 = _conv(d4, widths[2], 1, 1, "reduce3", train)
        r3 = jnp.repeat(jnp.repeat(r3, 2, axis=1), 2, axis=2)
        d3 = _block5(jnp.concatenate([r3, c3], -1), widths[2], "neck3",
                     train)

        preds = []
        for lvl, (d, ch) in enumerate(zip((d5, d4, d3), bridge)):
            h = _conv(d, ch, 3, 1, f"head{lvl}", train)
            # init parity (yolo_head.py:172): convs_pred Normal(std=0.01)
            p = nn.Conv(3 * (5 + self.num_classes), (1, 1),
                        kernel_init=nn.initializers.normal(0.01),
                        name=f"pred{lvl}")(h)
            preds.append(p)
        return YOLOV3Outputs(tuple(preds), (d5, d4, d3))


def yolo_level_anchors(featmap_size, level: int) -> jnp.ndarray:
    """(H*W*3, 4) xyxy anchor boxes centered on cell centers."""
    h, w = featmap_size
    s = STRIDES[level]
    ys, xs = np.mgrid[:h, :w]
    cx = (xs + 0.5) * s
    cy = (ys + 0.5) * s
    boxes = []
    for aw, ah in ANCHORS[level]:
        boxes.append(np.stack([cx - aw / 2, cy - ah / 2,
                               cx + aw / 2, cy + ah / 2], -1).reshape(-1, 4))
    # cell-major, anchor-minor: (H*W, 3, 4)
    return jnp.asarray(np.stack(boxes, 1).reshape(-1, 4), jnp.float32)


class YOLOV3LossConfig(NamedTuple):
    num_classes: int = 80
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    obj_weight: float = 1.0
    cls_weight: float = 1.0
    xy_weight: float = 2.0
    wh_weight: float = 2.0


def yolov3_loss(out: YOLOV3Outputs, gt_bboxes, gt_labels, gt_valid,
                cfg: YOLOV3LossConfig):
    """GridAssigner targets + batch-SUM losses (yolo_head.py:350-391 with
    the yolov3_d53 config's reduction='sum' on every term).

    GridAssigner (grid_assigner.py:72-156, pos/neg 0.5/0.5, min_pos 0):
      * default ignore; anchors with max-gt IoU <= neg_thr are negative;
      * RESPONSIBLE anchors (their cell contains some gt center at that
        level) with max IoU > pos_thr are positive to their argmax gt;
      * each gt additionally claims its best-IoU responsible anchor
        (> min_pos_iou, gt order: later gts overwrite).
    Conf trains on pos+neg (ignored anchors weight 0); xy/wh/cls on pos.
    No avg_factor anywhere — the reference recipe's losses are raw sums."""
    B = out.preds[0].shape[0]
    C = cfg.num_classes
    sizes = [p.shape[1:3] for p in out.preds]
    anchors = jnp.concatenate(
        [yolo_level_anchors(sz, i) for i, sz in enumerate(sizes)], axis=0)
    strides = jnp.concatenate([
        jnp.full((h * w * 3,), STRIDES[i], jnp.float32)
        for i, (h, w) in enumerate(sizes)])
    # flat per-anchor cell coords + level ids (cell-major, anchor-minor)
    cell_x, cell_y, lvl_id = [], [], []
    for i, (h, w) in enumerate(sizes):
        ys, xs = np.mgrid[:h, :w]
        cell_x.append(np.repeat(xs.reshape(-1), 3))
        cell_y.append(np.repeat(ys.reshape(-1), 3))
        lvl_id.append(np.full((h * w * 3,), i, np.int32))
    cell_x = jnp.asarray(np.concatenate(cell_x), jnp.int32)
    cell_y = jnp.asarray(np.concatenate(cell_y), jnp.int32)
    lvl_id = jnp.asarray(np.concatenate(lvl_id), jnp.int32)
    lvl_strides = jnp.asarray(STRIDES, jnp.float32)[lvl_id]
    preds = jnp.concatenate(
        [p.reshape(B, -1, 5 + C) for p in out.preds], axis=1)  # (B, N, .)
    N = anchors.shape[0]
    G = gt_bboxes.shape[1]

    def per_image(pred, gtb, gtl, gtv):
        gcx = (gtb[:, 0] + gtb[:, 2]) * 0.5
        gcy = (gtb[:, 1] + gtb[:, 3]) * 0.5
        gx = jnp.floor(gcx[None, :] / lvl_strides[:, None]).astype(jnp.int32)
        gy = jnp.floor(gcy[None, :] / lvl_strides[:, None]).astype(jnp.int32)
        resp_ng = ((cell_x[:, None] == gx) & (cell_y[:, None] == gy)
                   & gtv[None, :])                          # (N, G)
        flags = resp_ng.any(1)                              # (N,)

        ious_all = jnp.where(gtv[None], bbox_overlaps(anchors, gtb), -1.0)
        max_all = ious_all.max(1)
        neg = (max_all >= 0) & (max_all <= cfg.neg_iou_thr)

        masked = jnp.where(flags[:, None], ious_all, -1.0)  # (N, G)
        m = masked.max(1)
        am = jnp.argmax(masked, 1).astype(jnp.int32)
        assigned = jnp.where(m > cfg.pos_iou_thr, am, -1)
        # rule 4: each gt claims its best responsible anchor
        gt_best = jnp.argmax(masked, axis=0)
        ok = gtv & (masked.max(0) > 0.0) & flags[gt_best]
        assigned = assigned.at[jnp.where(ok, gt_best, N)].set(
            jnp.arange(G, dtype=jnp.int32), mode="drop")

        pos = assigned >= 0
        gt_of = jnp.clip(assigned, 0, G - 1)
        pw = pos.astype(jnp.float32)
        conf_w = (pos | (neg & ~pos)).astype(jnp.float32)

        enc = yolo_encode(anchors, gtb[gt_of], strides)     # (N, 4)
        loss_xy = cfg.xy_weight * L.bce_loss(
            pred[:, :2], enc[:, :2], weight=pw[:, None], reduction="sum")
        loss_wh = cfg.wh_weight * L.mse_loss(
            pred[:, 2:4], enc[:, 2:], weight=pw[:, None], reduction="sum")
        loss_obj = cfg.obj_weight * L.bce_loss(
            pred[:, 4], pw, weight=conf_w, reduction="sum")
        onehot = jax.nn.one_hot(gtl[gt_of], C)
        loss_cls = cfg.cls_weight * L.bce_loss(
            pred[:, 5:], onehot, weight=pw[:, None], reduction="sum")
        return loss_xy, loss_wh, loss_obj, loss_cls

    lxy, lwh, lobj, lcls = jax.vmap(per_image)(
        preds, gt_bboxes, gt_labels, gt_valid)
    return dict(loss_xy=lxy.sum(), loss_wh=lwh.sum(),
                loss_conf=lobj.sum(), loss_cls=lcls.sum())


def yolov3_get_bboxes(out: YOLOV3Outputs, img_hw, scale_factor=None,
                      score_thr: float = 0.05, nms_iou: float = 0.45,
                      nms_pre: int = 1000, max_per_img: int = 100,
                      rescale: bool = False):
    B = out.preds[0].shape[0]
    C = out.preds[0].shape[-1] // 3 - 5
    sizes = [p.shape[1:3] for p in out.preds]
    anchors = jnp.concatenate(
        [yolo_level_anchors(sz, i) for i, sz in enumerate(sizes)], axis=0)
    strides = jnp.concatenate([
        jnp.full((h * w * 3,), STRIDES[i], jnp.float32)
        for i, (h, w) in enumerate(sizes)])
    preds = jnp.concatenate(
        [p.reshape(B, -1, 5 + C) for p in out.preds], axis=1)

    level_sizes = [p.shape[1] * p.shape[2] * 3 for p in out.preds]

    def per_image(pred, hw, sf):
        obj = jax.nn.sigmoid(pred[:, 4:5])
        # conf_thr=0.005 objectness gate (yolo_head get_bboxes + test_cfg)
        obj = jnp.where(obj >= 0.005, obj, 0.0)
        probs = jax.nn.sigmoid(pred[:, 5:]) * obj
        # nms_pre applies PER LEVEL (the reference's
        # _get_bboxes_single loops levels)
        top = filter_scores_and_topk_mlvl(probs, score_thr,
                                          nms_pre, level_sizes)
        sel = pred[top.keep_idxs]
        xywh = jnp.concatenate([jax.nn.sigmoid(sel[:, :2]), sel[:, 2:4]],
                               -1)
        boxes = yolo_decode(anchors[top.keep_idxs], xywh,
                            strides[top.keep_idxs])
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
    nb, ns, nl, keep = jax.vmap(per_image)(preds, img_hw, scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=keep)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        return YOLOV3(num_classes=cfg.model.num_classes,
                      backbone=cfg.model.backbone)

    def losses(model, cfg, **_):
        det_cfg = YOLOV3LossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            # darknet/mbv2 BN trains (the reference yolov3 recipes carry
            # no norm_eval; stats thread through batch_stats)
            out, mutated = model.apply(
                variables, batch.images, batch.img_hw,
                deterministic=True, train=True, mutable=["batch_stats"])
            return yolov3_loss(out, batch.gt_bboxes, batch.gt_labels,
                               batch.gt_valid,
                               det_cfg), mutated["batch_stats"]
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            d = yolov3_get_bboxes(out, img_hw, scale_factor=scale_factors,
                                  score_thr=max(score_thr, 0.05),
                                  max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("yolov3", build=build, losses=losses,
                    eval_step=eval_step)


_register()

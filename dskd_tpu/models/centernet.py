"""CenterNet (parity: mmdet dense_heads/centernet_head.py +
necks/ct_resnet_neck.py + configs/centernet/centernet_resnet18_*).

Keypoint-style detection: an output-stride-4 feature map predicts a
per-class center heatmap (gaussian focal loss on rendered gaussian
targets), a wh map and a sub-pixel center offset map (L1 at centers).
Decode is NMS-free: 3x3 max-pool local-maximum suppression + top-k.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from .resnet import FrozenBatchNorm, ResNet


class CenterNetOutputs(NamedTuple):
    heatmap: jnp.ndarray   # (B, H, W, C) logits
    wh: jnp.ndarray        # (B, H, W, 2)
    offset: jnp.ndarray    # (B, H, W, 2)
    neck_feats: Tuple[jnp.ndarray, ...]


class CTResNetNeck(nn.Module):
    """Three 3x3 conv + 4x4 stride-2 transposed-conv blocks
    (ct_resnet_neck.py: num_deconv_filters (256, 128, 64))."""
    filters: Sequence[int] = (256, 128, 64)

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.filters):
            x = nn.Conv(f, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, name=f"conv{i}")(x)
            x = nn.relu(FrozenBatchNorm(name=f"conv_bn{i}")(x))
            # flax ConvTranspose 'SAME' at stride 2 doubles the spatial dims
            # (the torch deconv k4 s2 p1 equivalent)
            x = nn.ConvTranspose(f, (4, 4), strides=(2, 2),
                                 padding="SAME", use_bias=False,
                                 name=f"deconv{i}")(x)
            x = nn.relu(FrozenBatchNorm(name=f"deconv_bn{i}")(x))
        return x


class CenterNetHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 64

    @nn.compact
    def __call__(self, feat):
        def branch(out_ch, name, bias_init=0.0, kernel_init=None):
            kw = {} if kernel_init is None else dict(kernel_init=kernel_init)
            x = nn.Conv(self.feat_channels, (3, 3),
                        padding=[(1, 1), (1, 1)], name=f"{name}_conv",
                        **kw)(feat)
            x = nn.relu(x)
            return nn.Conv(out_ch, (1, 1),
                           bias_init=nn.initializers.constant(bias_init),
                           name=f"{name}_out", **kw)(x)

        # init parity (centernet_head.py:73-79): heatmap out bias
        # -2.19 = log(0.1/0.9); wh/offset convs Normal(std=0.001)
        n001 = nn.initializers.normal(0.001)
        heatmap = branch(self.num_classes, "heatmap", bias_init=-2.19)
        wh = branch(2, "wh", kernel_init=n001)
        offset = branch(2, "offset", kernel_init=n001)
        return heatmap, wh, offset


class CenterNet(nn.Module):
    num_classes: int = 80
    depth: int = 18
    frozen_stages: int = -1

    @nn.compact
    def __call__(self, images, img_hw, deterministic: bool = True):
        feats = ResNet(depth=self.depth, out_indices=(3,),
                       frozen_stages=self.frozen_stages,
                       name="backbone")(images)
        neck = CTResNetNeck(name="neck")(feats[-1])
        heatmap, wh, offset = CenterNetHead(
            num_classes=self.num_classes, name="bbox_head")(neck)
        return CenterNetOutputs(heatmap, wh, offset, (neck,))


def render_targets(gt_bboxes, gt_labels, gt_valid, num_classes,
                   feat_hw: Tuple[int, int], stride: int = 4):
    """Per-image gaussian heatmap + wh/offset targets at centers
    (centernet_head.py:216-240: gaussian_radius(min_overlap=0.3) with
    int truncation + gen_gaussian_target's windowed splat, shared with
    the corner families).

    gt boxes in INPUT coords. Returns (heatmap (H, W, C), wh (G, 2),
    offset (G, 2), center int indices (G, 2) as (y, x), valid (G,))."""
    from .cornernet import gaussian_radius, gaussian_splat_max

    H, W = feat_hw
    cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2 / stride
    cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2 / stride
    w = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) / stride
    h = (gt_bboxes[:, 3] - gt_bboxes[:, 1]) / stride
    ix = jnp.clip(jnp.floor(cx), 0, W - 1).astype(jnp.int32)
    iy = jnp.clip(jnp.floor(cy), 0, H - 1).astype(jnp.int32)
    radius = jnp.clip(gaussian_radius(h, w), 0, None)
    onehot = jax.nn.one_hot(gt_labels, num_classes) * gt_valid[:, None]
    heatmap = gaussian_splat_max(ix, iy, onehot, radius, (H, W))

    wh_t = jnp.stack([w, h], -1)
    off_t = jnp.stack([cx - ix, cy - iy], -1)
    return heatmap, wh_t, off_t, jnp.stack([iy, ix], -1), gt_valid


class CenterNetLossConfig(NamedTuple):
    num_classes: int = 80
    loss_heatmap_weight: float = 1.0
    loss_wh_weight: float = 0.1
    loss_offset_weight: float = 1.0


def centernet_loss(out: CenterNetOutputs, gt_bboxes, gt_labels, gt_valid,
                   cfg: CenterNetLossConfig, stride: int = 4):
    B, H, W, C = out.heatmap.shape
    hm_t, wh_t, off_t, centers, valid = jax.vmap(
        lambda b, l, v: render_targets(b, l, v, C, (H, W), stride))(
        gt_bboxes, gt_labels, gt_valid)

    num_pos = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
    loss_heatmap = cfg.loss_heatmap_weight * L.gaussian_focal_loss(
        jax.nn.sigmoid(out.heatmap).reshape(-1), hm_t.reshape(-1),
        avg_factor=num_pos)

    flat_idx = centers[..., 0] * W + centers[..., 1]       # (B, G)
    wh_pred = jnp.take_along_axis(
        out.wh.reshape(B, H * W, 2), flat_idx[..., None], axis=1)
    off_pred = jnp.take_along_axis(
        out.offset.reshape(B, H * W, 2), flat_idx[..., None], axis=1)
    w_ = valid.astype(jnp.float32)[..., None]
    loss_wh = cfg.loss_wh_weight * L.l1_loss(
        wh_pred.reshape(-1, 2), wh_t.reshape(-1, 2),
        weight=w_.reshape(-1, 1), avg_factor=2 * num_pos)
    loss_offset = cfg.loss_offset_weight * L.l1_loss(
        off_pred.reshape(-1, 2), off_t.reshape(-1, 2),
        weight=w_.reshape(-1, 1), avg_factor=2 * num_pos)
    return dict(loss_center_heatmap=loss_heatmap, loss_wh=loss_wh,
                loss_offset=loss_offset)


def centernet_get_bboxes(out: CenterNetOutputs, img_hw, scale_factor=None,
                         topk: int = 100, stride: int = 4,
                         score_thr: float = 0.0, rescale: bool = False):
    """Local-max (3x3 pool) heatmap decode, NMS-free (get_local_maximum +
    get_topk_from_heatmap)."""
    B, H, W, C = out.heatmap.shape
    heat = jax.nn.sigmoid(out.heatmap)
    pooled = nn.max_pool(heat, (3, 3), strides=(1, 1),
                         padding=((1, 1), (1, 1)))
    heat = jnp.where(jnp.abs(pooled - heat) < 1e-6, heat, 0.0)

    def per_image(hm, wh, off, hw, sf):
        flat = hm.reshape(-1)                              # (H*W*C,)
        scores, idx = jax.lax.top_k(flat, topk)
        cls = (idx % C).astype(jnp.int32)
        pix = idx // C
        ys = (pix // W).astype(jnp.float32)
        xs = (pix % W).astype(jnp.float32)
        o = off.reshape(-1, 2)[pix]
        s = wh.reshape(-1, 2)[pix]
        cxs = (xs + o[:, 0]) * stride
        cys = (ys + o[:, 1]) * stride
        bw = s[:, 0] * stride
        bh = s[:, 1] * stride
        boxes = jnp.stack([cxs - bw / 2, cys - bh / 2,
                           cxs + bw / 2, cys + bh / 2], -1)
        h, w = hw[0].astype(boxes.dtype), hw[1].astype(boxes.dtype)
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, w), jnp.clip(boxes[:, 1], 0, h),
            jnp.clip(boxes[:, 2], 0, w), jnp.clip(boxes[:, 3], 0, h)], -1)
        if rescale and sf is not None:
            boxes = boxes / sf[None]
        return boxes, scores, cls, scores > score_thr

    if scale_factor is None:
        scale_factor = jnp.ones((B, 4), jnp.float32)
    nb, ns, nl, keep = jax.vmap(per_image)(heat, out.wh, out.offset,
                                           img_hw, scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=keep)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return CenterNet(num_classes=m.num_classes, depth=m.depth,
                         frozen_stages=m.frozen_stages)

    def losses(model, cfg, **_):
        det_cfg = CenterNetLossConfig(num_classes=cfg.model.num_classes)

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=True)
            return centernet_loss(out, batch.gt_bboxes, batch.gt_labels,
                                  batch.gt_valid, det_cfg), None
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            d = centernet_get_bboxes(out, img_hw,
                                     scale_factor=scale_factors,
                                     score_thr=max(score_thr, 0.05),
                                     topk=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("centernet", build=build, losses=losses,
                    eval_step=eval_step)


_register()

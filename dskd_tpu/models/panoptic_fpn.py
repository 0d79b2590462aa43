"""Panoptic FPN (parity: mmdet models/seg_heads/panoptic_fpn_head.py +
seg_heads/base_semantic_head.py + panoptic_fusion_heads/
heuristic_fusion_head.py + models/utils/conv_upsample.py +
configs/panoptic_fpn/panoptic_fpn_r50_fpn_1x_coco.py, PQ 40.2 / box AP
40.0 / mask AP 36.5).

TPU-first design:
  * the semantic branch is fully static: every FPN level runs its
    ConvUpsample tower to the common 1/4 scale, the towers sum, and one
    1x1 conv emits (num_stuff + 1) logits — all shapes known at trace
    time;
  * the semantic GT rides the batch as a padded (B, H/4, W/4) int32 map
    (255 = void/pad) instead of the reference's per-image full-scale
    DataContainer, so the CE loss is one masked gather-free reduction;
  * the heuristic panoptic fusion (score-ordered instance laying +
    stuff argmax + area filtering) is inherently per-image dynamic and
    runs host-side in numpy at eval only — it never enters a jitted
    program.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .faster_rcnn import BBoxHead, RPNHead
from .fpn import FPN
from .mask_rcnn import FCNMaskHead
from .resnet import ResNet

# pan_id = ins_id * INSTANCE_OFFSET + cat_id
# (core/evaluation/panoptic_utils.py:6)
INSTANCE_OFFSET = 1000


def _upsample2x(x):
    """Bilinear 2x upsample (F.interpolate align_corners=False)."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), "bilinear")


class ConvUpsample(nn.Module):
    """models/utils/conv_upsample.py: ``num_layers`` 3x3 conv+GN+relu
    blocks; the first ``num_upsample`` of them are each followed by a
    bilinear 2x upsample."""
    inner_channels: int = 128
    num_layers: int = 1
    num_upsample: int = 0

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = nn.Conv(self.inner_channels, (3, 3),
                        padding=[(1, 1), (1, 1)], name=f"conv{i}")(x)
            x = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                     name=f"gn{i}")(x))
            if i < self.num_upsample:
                x = _upsample2x(x)
        return x


class PanopticFPNHead(nn.Module):
    """seg_heads/panoptic_fpn_head.py: per-level ConvUpsample towers to
    the 1/4 scale, summed, then a 1x1 conv over ``num_stuff + 1``
    channels (all thing classes merge into the last channel)."""
    num_stuff_classes: int = 53
    inner_channels: int = 128
    start_level: int = 0
    end_level: int = 4

    @nn.compact
    def __call__(self, feats):
        """feats: FPN levels (1/4 .. 1/32+). Returns (B, H/4, W/4,
        num_stuff + 1) logits."""
        outs = []
        for i in range(self.start_level, self.end_level):
            tower = ConvUpsample(self.inner_channels,
                                 num_layers=i if i > 0 else 1,
                                 num_upsample=i if i > 0 else 0,
                                 name=f"tower{i}")
            outs.append(tower(feats[i]))
        x = sum(outs)
        return nn.Conv(self.num_stuff_classes + 1, (1, 1),
                       kernel_init=nn.initializers.normal(0.01),
                       name="conv_logits")(x)


def set_things_to_void(gt_semantic, num_things: int, num_stuff: int):
    """panoptic_fpn_head.py _set_things_to_void: stuff labels shift to
    0..num_stuff-1, every thing label merges into channel ``num_stuff``;
    anything else (255 void/pad) is left as-is."""
    g = gt_semantic.astype(jnp.int32)
    is_thing = g < num_things
    is_stuff = (g >= num_things) & (g < num_things + num_stuff)
    out = jnp.where(is_stuff, g - num_things, g)
    return jnp.where(is_thing, num_stuff, out)


def semantic_loss(seg_logits, gt_semantic, num_things: int,
                  num_stuff: int, ignore_index: int = 255):
    """base_semantic_head.py loss: per-pixel CE after the
    things-to-void remap; void/pad pixels (ignore_index) drop out of
    the average."""
    tgt = set_things_to_void(gt_semantic, num_things, num_stuff)
    valid = (tgt != ignore_index) & (tgt >= 0) \
        & (tgt <= num_stuff)
    safe = jnp.clip(tgt, 0, num_stuff)
    logp = jax.nn.log_softmax(seg_logits.astype(jnp.float32), -1)
    ce = -jnp.take_along_axis(logp, safe[..., None], -1)[..., 0]
    n = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
    return (ce * valid).sum() / n


class PanopticFPNOutputs(NamedTuple):
    rpn: object
    neck_feats: Tuple[jnp.ndarray, ...]
    seg_logits: jnp.ndarray


class PanopticFPN(nn.Module):
    """detectors/panoptic_fpn.py: Mask R-CNN + semantic FPN branch."""
    num_classes: int = 80            # thing classes (the box/mask path)
    num_stuff_classes: int = 53
    depth: int = 50
    frozen_stages: int = 1

    def setup(self):
        self.backbone = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                               frozen_stages=self.frozen_stages)
        self.neck = FPN(out_channels=256, num_outs=5, start_level=0,
                        add_extra_convs="")
        self.rpn_head = RPNHead()
        self.roi_bbox_head = BBoxHead(num_classes=self.num_classes)
        self.mask_head = FCNMaskHead(num_classes=self.num_classes)
        self.semantic_head = PanopticFPNHead(
            num_stuff_classes=self.num_stuff_classes)

    def __call__(self, images, img_hw, deterministic: bool = True):
        feats = self.backbone(images)
        neck = self.neck(feats)
        return PanopticFPNOutputs(self.rpn_head(neck), neck,
                                  self.semantic_head(neck))

    def roi_forward(self, roi_feats):
        return self.roi_bbox_head(roi_feats)

    def mask_forward(self, roi_feats14):
        return self.mask_head(roi_feats14)

    def init_all(self, images, img_hw, deterministic: bool = True):
        out = self(images, img_hw, deterministic)
        self.roi_bbox_head(jnp.zeros((1, 7, 7, 256), images.dtype))
        self.mask_head(jnp.zeros((1, 14, 14, 256), images.dtype))
        return out


def heuristic_fuse(det_boxes: np.ndarray, det_scores: np.ndarray,
                   det_labels: np.ndarray, inst_masks: np.ndarray,
                   seg_logits: np.ndarray, num_things: int,
                   num_stuff: int, overlap_thr: float = 0.5,
                   stuff_area_limit: int = 4096) -> np.ndarray:
    """Host-side HeuristicFusionHead.simple_test + _lay_masks: returns
    the (H, W) int64 panoptic map (pan_id = ins_id * INSTANCE_OFFSET +
    contiguous category; ``num_things + num_stuff`` = void).

    det_*: (K,) post-NMS detections (scores already thresholded);
    inst_masks: (K, H, W) bool pasted instance masks; seg_logits:
    (H, W, num_stuff + 1) semantic logits at full resolution."""
    num_classes = num_things + num_stuff
    H, W = inst_masks.shape[-2:] if len(inst_masks) else seg_logits.shape[:2]

    # lay instances by descending score; skip heavily-occluded ones
    order = np.argsort(-det_scores, kind="mergesort")
    id_map = np.zeros((H, W), np.int64)
    kept_labels = []
    instance_id = 1
    for idx in order:
        m = inst_masks[idx].astype(bool)
        area = m.sum()
        if area == 0:
            continue
        pasted = id_map > 0
        if (m & pasted).sum() / (area + 1e-5) > overlap_thr:
            continue
        id_map[m & ~pasted] = instance_id
        kept_labels.append(int(det_labels[idx]))
        instance_id += 1

    # stuff background: argmax over (num_stuff + 1); channel num_stuff is
    # the merged "thing" channel -> maps to num_classes (void-ish until an
    # instance claims it)
    seg = seg_logits.argmax(-1).astype(np.int64) + num_things
    pan = seg.copy()

    for i, cls in enumerate(kept_labels):
        m = id_map == (i + 1)
        if m.sum() == 0:
            continue
        pan[m] = cls + (i + 1) * INSTANCE_OFFSET

    # drop tiny stuff segments (stuff_area_limit)
    ids, counts = np.unique(pan % INSTANCE_OFFSET, return_counts=True)
    small_stuff = ids[(ids >= num_things) & (ids < num_classes)
                      & (counts < stuff_area_limit)]
    if len(small_stuff):
        pan[np.isin(pan % INSTANCE_OFFSET, small_stuff)
            & (pan < INSTANCE_OFFSET)] = num_classes
    # the merged-thing background channel is void too
    pan[pan == num_things + num_stuff] = num_classes
    return pan


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return PanopticFPN(num_classes=m.num_classes,
                           num_stuff_classes=m.num_stuff_classes,
                           depth=m.depth, frozen_stages=m.frozen_stages)

    def losses(model, cfg, **_):
        from .mask_rcnn import mask_family_losses
        return mask_family_losses(model, cfg, panoptic=True)

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..models.faster_rcnn import rcnn_get_bboxes, rpn_proposals
        from ..models.mask_rcnn import mask_rcnn_get_masks
        from ..utils.det import DetP

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            # Mask R-CNN box+mask path plus the semantic logits; the
            # heuristic panoptic fusion runs host-side (heuristic_fuse)
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            props, _, pvalid = rpn_proposals(out.rpn, img_hw, nms_pre=1000,
                                             max_total=1000)
            d = rcnn_get_bboxes(
                lambda f: model.apply(variables, f,
                                      method=PanopticFPN.roi_forward),
                out.neck_feats, props, pvalid, img_hw,
                num_classes=model.num_classes, scale_factor=scale_factors,
                score_thr=max(score_thr, 0.05), max_per_img=max_per_img,
                rescale=True)
            rois_in = d["bboxes"] * scale_factors[:, None, :]
            probs = mask_rcnn_get_masks(model, variables, out.neck_feats,
                                        rois_in, d["valid"],
                                        method=PanopticFPN.mask_forward)
            sel = jnp.take_along_axis(
                probs, jnp.clip(d["labels"], 0, probs.shape[-1] - 1)
                [:, :, None, None, None].astype(jnp.int32), axis=-1)[..., 0]
            return DetP(d["bboxes"], d["scores"], d["labels"], d["valid"],
                        sel, out.seg_logits)
        return step

    register_family("panoptic_fpn", build=build, losses=losses,
                    eval_step=eval_step, init_all=True, with_mask=True,
                    with_semantic=True)


_register()

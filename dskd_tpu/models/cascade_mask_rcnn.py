"""Cascade Mask R-CNN (parity: mmdet roi_heads/cascade_roi_head.py with
mask_head (interleaved=False) + configs/cascade_rcnn/
cascade_mask_rcnn_r50_fpn_1x_coco.py, box AP 41.2 / mask AP 35.9).

The cascade bbox trunk is CascadeRCNN's; each of the 3 stages adds its
own FCN mask head trained on that stage's OWN sampling results, with the
stage loss weights (1 / 0.5 / 0.25). Test time averages the 3 heads'
sigmoid mask probabilities on the final ensembled boxes
(cascade_roi_head.simple_test's aug_masks mean).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .cascade_rcnn import CascadeRCNN
from .mask_rcnn import MASK_SIZE, FCNMaskHead


class CascadeMaskRCNN(CascadeRCNN):
    def setup(self):
        super().setup()
        self.mask_heads = [FCNMaskHead(num_classes=self.num_classes,
                                       name=f"mask_head{i}")
                           for i in range(self.num_stages)]

    def mask_forward(self, roi_feats14, stage: int):
        return self.mask_heads[stage](roi_feats14)

    def init_all(self, images, img_hw, deterministic: bool = True):
        out = super().init_all(images, img_hw, deterministic)
        for h in self.mask_heads:
            h(jnp.zeros((1, 14, 14, 256), images.dtype))
        return out


def cascade_mask_probs(model, variables, neck_feats, det_boxes, det_valid):
    """(B, R, 28, 28, C) sigmoid probs averaged over the 3 stage heads
    on the final detection boxes (simple_test mask ensembling)."""
    from ..ops.roi_align import multi_level_roi_align
    B, R = det_boxes.shape[:2]
    feats_pi = [tuple(f[b] for f in neck_feats[:4]) for b in range(B)]
    f14 = jnp.stack([
        multi_level_roi_align(feats_pi[b], det_boxes[b], det_valid[b],
                              out_size=14) for b in range(B)])
    flat = f14.reshape(B * R, 14, 14, -1)
    probs = sum(
        jax.nn.sigmoid(model.apply(variables, flat, stage=s,
                                   method=CascadeMaskRCNN.mask_forward))
        for s in range(model.num_stages)) / model.num_stages
    return probs.reshape(B, R, MASK_SIZE, MASK_SIZE, -1)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return CascadeMaskRCNN(num_classes=m.num_classes, depth=m.depth,
                               frozen_stages=m.frozen_stages)

    def losses(model, cfg, **_):
        from .cascade_rcnn import cascade_family_losses
        return cascade_family_losses(model, cfg, with_mask=True)

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..models.cascade_rcnn import CascadeRCNN, cascade_get_bboxes
        from ..models.faster_rcnn import rpn_proposals
        from ..utils.det import DetM

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            props, _, pvalid = rpn_proposals(out.rpn, img_hw, nms_pre=1000,
                                             max_total=1000)
            d = cascade_get_bboxes(
                lambda f, st: model.apply(variables, f, st,
                                          method=CascadeRCNN.roi_forward),
                out.neck_feats, props, pvalid, img_hw,
                num_classes=model.num_classes, scale_factor=scale_factors,
                score_thr=max(score_thr, 0.05), max_per_img=max_per_img,
                rescale=True)
            rois_in = d["bboxes"] * scale_factors[:, None, :]
            probs = cascade_mask_probs(model, variables, out.neck_feats,
                                       rois_in, d["valid"])
            sel = jnp.take_along_axis(
                probs, jnp.clip(d["labels"], 0, probs.shape[-1] - 1)
                [:, :, None, None, None].astype(jnp.int32), axis=-1)[..., 0]
            return DetM(d["bboxes"], d["scores"], d["labels"], d["valid"],
                        sel)
        return step

    register_family("cascade_mask_rcnn", build=build, losses=losses,
                    eval_step=eval_step, init_all=True, with_mask=True)


_register()

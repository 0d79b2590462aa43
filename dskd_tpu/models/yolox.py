"""YOLOX detector (parity: mmdet/models/detectors/yolox.py +
configs/yolox/yolox_s_8x8_300e_coco.py, YOLOX-s box AP 40.5): the
anchor-free decoupled-head YOLO with SimOTA assignment — CSPDarknet
(deepen 0.33 / widen 0.5 for -s), YOLOXPAFPN, YOLOXHead with
IoU(mode='square') box loss, obj/cls BCE, and an L1 branch enabled for
the final no-augmentation epochs (YOLOXModeSwitchHook semantics — the
driver swaps in a use_l1 train step when Mosaic/MixUp turn off).

The fork's YOLOY family (models/yoloy.py) is this architecture with a
ResNet-18 trunk plus the incremental teacher protocol; YOLOX here is the
upstream non-IL variant. Multi-scale "random resize every 10 iters"
(detectors/yolox.py:249 _random_resize) is expressed TPU-natively as the
data pipeline's multi-scale + aspect-bucket canvases (static shapes per
bucket) rather than an in-graph dynamic resize.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .csp_darknet import CSPDarknet
from .yoloy import YOLOYOutputs
from .yoloy_head import YOLOYHead
from .yoloy_pafpn import YOLOYPAFPN


class YOLOX(nn.Module):
    num_classes: int = 80
    deepen_factor: float = 0.33
    widen_factor: float = 0.5
    neck_channels: int = 128
    frozen_stages: int = -1

    @nn.compact
    def __call__(self, images: jnp.ndarray, img_hw: jnp.ndarray,
                 deterministic: bool = True) -> YOLOYOutputs:
        train = not deterministic
        feats = CSPDarknet(deepen_factor=self.deepen_factor,
                           widen_factor=self.widen_factor,
                           out_indices=(2, 3, 4),
                           frozen_stages=self.frozen_stages,
                           name="backbone")(images, train=train)
        neck = YOLOYPAFPN(out_channels=self.neck_channels,
                          name="neck")(feats, train=train)
        head = YOLOYHead(num_classes=self.num_classes,
                         in_channels=self.neck_channels,
                         feat_channels=self.neck_channels,
                         name="bbox_head")(neck, train=train)
        return YOLOYOutputs(head, neck)


# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        return YOLOX(num_classes=cfg.model.num_classes)

    def losses(model, cfg, *, use_l1=False, **_):
        from .yoloy_head import YOLOYLossConfig, yoloy_detection_loss
        # ``use_l1`` is YOLOX's ModeSwitch extra: the driver rebuilds the
        # step with it on when the no-aug phase starts
        # (detectors/yolox.py + YOLOXModeSwitchHook)
        det_cfg = YOLOYLossConfig(num_classes=cfg.model.num_classes,
                                  bbox_loss="square_iou", use_l1=use_l1)

        def losses_fn(variables, batch, teacher_vars, rng):
            out, mutated = model.apply(
                variables, batch.images, batch.img_hw, deterministic=False,
                mutable=["batch_stats"])
            return yoloy_detection_loss(
                out.head, batch.gt_bboxes, batch.gt_labels, batch.gt_valid,
                det_cfg), mutated["batch_stats"]
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        import jax

        from ..utils.det import Det
        from .yoloy_head import yoloy_get_bboxes

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            d = yoloy_get_bboxes(out.head, img_hw,
                                 scale_factor=scale_factors,
                                 score_thr=max(score_thr, 0.01),
                                 max_per_img=max_per_img, rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("yolox", build=build, losses=losses,
                    eval_step=eval_step)


_register()

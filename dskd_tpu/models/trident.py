"""TridentNet backbone (parity: mmdet/models/backbones/trident_resnet.py).

A ResNet-50 whose LAST stage is replaced by trident blocks: the
bottleneck's 3x3 runs on three parallel branches with dilations (1, 2, 3)
and SHARED weights (scale-invariant multi-branch training). In training
all branches run (each branch is its own stream; outputs are returned as
a tuple); at test time only ``test_branch_idx`` (default 1, dilation 2)
runs — the single-branch fast path the reference deploys.

Weight sharing falls out of applying the SAME flax Conv param with
different `kernel_dilation` values — no weight copies exist.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import Bottleneck, FrozenBatchNorm

TRIDENT_DILATIONS = (1, 2, 3)


class TridentBottleneck(nn.Module):
    """Bottleneck whose 3x3 is shared across dilated branches.

    ``__call__`` takes and returns a TUPLE of per-branch tensors.
    """
    planes: int
    stride: int = 1
    downsample: bool = False
    test_branch_idx: int = -1      # -1 = run all branches

    @nn.compact
    def __call__(self, xs, dilations=None):
        w = self.param("conv2_kernel", nn.initializers.he_normal(),
                       (3, 3, self.planes, self.planes))
        conv1 = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")
        bn1 = FrozenBatchNorm(name="bn1")
        bn2 = FrozenBatchNorm(name="bn2")
        conv3 = nn.Conv(4 * self.planes, (1, 1), use_bias=False,
                        name="conv3")
        bn3 = FrozenBatchNorm(name="bn3")
        down_c = down_bn = None
        if self.downsample:
            down_c = nn.Conv(4 * self.planes, (1, 1),
                             strides=(self.stride, self.stride),
                             use_bias=False, name="downsample_conv")
            down_bn = FrozenBatchNorm(name="downsample_bn")

        if dilations is not None:          # explicit per-call override
            branches, dils = range(len(xs)), dilations
        else:
            branches = (range(len(xs)) if self.test_branch_idx < 0
                        else [0])
            dils = (TRIDENT_DILATIONS if self.test_branch_idx < 0
                    else [TRIDENT_DILATIONS[self.test_branch_idx]])
        outs = []
        for bi, d in zip(branches, dils):
            x = xs[bi]
            idn = x
            y = nn.relu(bn1(conv1(x)))
            y = jax.lax.conv_general_dilated(
                y, w, window_strides=(self.stride, self.stride),
                padding=[(d, d), (d, d)], rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = nn.relu(bn2(y))
            y = bn3(conv3(y))
            if self.downsample:
                idn = down_bn(down_c(x))
            outs.append(nn.relu(y + idn))
        return tuple(outs)


class TridentResNet(nn.Module):
    """ResNet-50 with the final stage tridented.

    Returns (C2, C3, C4, [C5 branches...]): at train (test_branch_idx=-1)
    the last entry is a tuple of 3 branch maps; in test mode a 1-tuple.
    """
    depth: int = 50
    frozen_stages: int = 1
    test_branch_idx: int = 1
    out_indices: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train_branches: bool = False):
        blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[self.depth]
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="stem_conv")(x)
        y = nn.relu(FrozenBatchNorm(name="stem_bn")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        if self.frozen_stages >= 0:
            y = jax.lax.stop_gradient(y)

        outs = []
        for s in range(3):                      # plain stages 1-3
            planes = 64 * 2 ** s
            for b in range(blocks[s]):
                y = Bottleneck(planes,
                               stride=2 if (b == 0 and s > 0) else 1,
                               downsample=(b == 0),
                               name=f"layer{s + 1}_block{b}")(y)
            if s + 1 <= self.frozen_stages:
                y = jax.lax.stop_gradient(y)
            if s in self.out_indices:
                outs.append(y)

        # trident stage
        tbi = -1 if train_branches else self.test_branch_idx
        n_br = len(TRIDENT_DILATIONS) if train_branches else 1
        xs = tuple(y for _ in range(n_br))
        for b in range(blocks[3]):
            xs = TridentBottleneck(512, stride=2 if b == 0 else 1,
                                   downsample=(b == 0),
                                   test_branch_idx=tbi,
                                   name=f"layer4_block{b}")(xs)
        if 3 in self.out_indices:
            outs.append(xs)
        return tuple(outs)


class TridentOutputs(NamedTuple):
    rpn: object
    c4: jnp.ndarray                     # (B*branches, H/16, W/16, 1024)
    num_branch: int


class TridentFasterRCNN(nn.Module):
    """TridentNet detector (parity: detectors/trident_faster_rcnn.py +
    roi_heads/trident_roi_head.py + configs/tridentnet/
    tridentnet_r50_caffe_1x_coco.py, box AP 37.6).

    C4 Faster R-CNN whose conv4 stage (layer3, stride 16) is tridented:
    the three weight-shared dilated branches behave as a 3x BATCH
    expansion at train time (each image is seen by every branch; GT are
    tiled alongside), while at test only ``test_branch_idx``=1 runs —
    so deployment cost equals a plain C4 Faster R-CNN. The ROI head is
    the C4 shared res5: 14x14 RoIAlign on conv4 -> layer4 bottlenecks
    (stride 2 -> 7x7x2048) -> global average pool -> cls/reg.

    RPN anchors follow the C4 config: stride 16, scales (2,4,8,16,32),
    3 ratios (15 anchors/location). The mstrain configs' scale-aware
    per-branch GT ranges are not modeled (documented simplification —
    the base 1x config trains without them)."""
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = 1

    @staticmethod
    def anchor_scales():
        return (2.0, 4.0, 8.0, 16.0, 32.0)

    def setup(self):
        from .faster_rcnn import RPNHead
        # small depths map to block COUNTS only (still Bottleneck, so the
        # conv4 1024-ch / res5 2048-ch contract holds) — used by tiny
        # test builds; 50/101 match the reference
        blocks = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3),
                  50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[self.depth]
        self._blocks = blocks
        self.stem_conv = nn.Conv(64, (7, 7), strides=(2, 2),
                                 padding=[(3, 3), (3, 3)], use_bias=False,
                                 name="stem_conv")
        self.stem_bn = FrozenBatchNorm(name="stem_bn")
        self.layers12 = [
            [Bottleneck(64 * 2 ** s,
                        stride=2 if (b == 0 and s > 0) else 1,
                        downsample=(b == 0),
                        name=f"layer{s + 1}_block{b}")
             for b in range(blocks[s])] for s in range(2)]
        # tridented conv4 (planes 256 -> 1024ch out, stride 16)
        self.trident_blocks = [
            TridentBottleneck(256, stride=2 if b == 0 else 1,
                              downsample=(b == 0), test_branch_idx=-1,
                              name=f"layer3_block{b}")
            for b in range(blocks[2])]
        self.rpn_head = RPNHead(num_anchors=3 * len(self.anchor_scales()))
        # shared res5 ROI head
        self.res5 = [Bottleneck(512, stride=2 if b == 0 else 1,
                                downsample=(b == 0),
                                name=f"layer4_block{b}")
                     for b in range(blocks[3])]
        self.cls_fc = nn.Dense(self.num_classes + 1, name="cls_fc",
                               kernel_init=nn.initializers.normal(0.01))
        self.reg_fc = nn.Dense(self.num_classes * 4, name="reg_fc",
                               kernel_init=nn.initializers.normal(0.001))

    def __call__(self, images, img_hw, deterministic: bool = True,
                 train_branches: bool = False):
        y = nn.relu(self.stem_bn(self.stem_conv(images)))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.frozen_stages >= 0:
            y = jax.lax.stop_gradient(y)
        for s in range(2):
            for blk in self.layers12[s]:
                y = blk(y)
            if s + 1 <= self.frozen_stages:
                y = jax.lax.stop_gradient(y)
        n_br = len(TRIDENT_DILATIONS) if train_branches else 1
        xs = tuple(y for _ in range(n_br))
        dils = (TRIDENT_DILATIONS if train_branches
                else (TRIDENT_DILATIONS[1],))   # deploy branch: dilation 2
        for blk in self.trident_blocks:
            xs = blk(xs, dilations=dils)
        c4 = jnp.concatenate(xs, 0) if n_br > 1 else xs[0]
        return TridentOutputs(self.rpn_head([c4]), c4, n_br)

    def roi_forward(self, roi_feats14):
        """(M, 14, 14, 1024) conv4 ROI features -> res5 -> pooled cls/reg."""
        y = roi_feats14
        for blk in self.res5:
            y = blk(y)
        y = y.mean(axis=(1, 2))
        return self.cls_fc(y), self.reg_fc(y)

    def init_all(self, images, img_hw, deterministic: bool = True):
        out = self(images, img_hw, deterministic)
        self.roi_forward(jnp.zeros((1, 14, 14, 1024), images.dtype))
        return out



# --- family registration (dskd_tpu/registry.py) -------------------------

def _register():
    from ..registry import register_family

    def build(cfg):
        m = cfg.model
        return TridentFasterRCNN(num_classes=m.num_classes, depth=m.depth,
                                 frozen_stages=m.frozen_stages)

    def losses(model, cfg, **_):
        from ..models.faster_rcnn import (RCNNLossConfig, RPNLossConfig,
                                          rcnn_forward_train, rpn_loss,
                                          rpn_proposals)
        rpn_cfg = RPNLossConfig()
        # C4 config: 128 samples, pos_fraction 0.5, no GT-as-proposals
        rcnn_cfg = RCNNLossConfig(num_classes=cfg.model.num_classes,
                                  num_samples=cfg.rcnn_num_samples,
                                  pos_fraction=0.5,
                                  add_gt_as_proposals=False)
        scales = TridentFasterRCNN.anchor_scales()

        def losses_fn(variables, batch, teacher_vars, rng):
            rng1, rng2 = jax.random.split(rng)
            # train: all 3 dilated branches run; each behaves as an extra
            # batch replica (GT tiled alongside)
            out = model.apply(variables, batch.images, batch.img_hw,
                              train_branches=True)
            nb = out.num_branch
            gt_b = jnp.tile(batch.gt_bboxes, (nb, 1, 1))
            gt_l = jnp.tile(batch.gt_labels, (nb, 1))
            gt_v = jnp.tile(batch.gt_valid, (nb, 1))
            hw = jnp.tile(batch.img_hw, (nb, 1))
            losses = rpn_loss(out.rpn, gt_b, gt_v, hw, rng1, rpn_cfg,
                              strides=(16,), scales=scales)
            props, _, valid = rpn_proposals(
                out.rpn, hw, nms_pre=1000,
                max_total=cfg.rcnn_num_proposals,
                strides=(16,), scales=scales)
            props = jax.lax.stop_gradient(props)
            rcnn_losses, _ = rcnn_forward_train(
                lambda f: model.apply(
                    variables, f, method=TridentFasterRCNN.roi_forward),
                (out.c4,), props, valid, gt_b, gt_l, gt_v, rng2, rcnn_cfg,
                strides=(16,), out_size=14)
            losses.update({f"rcnn_{k}": v for k, v in rcnn_losses.items()})
            return losses, None
        return losses_fn

    def eval_step(model, *, score_thr, max_per_img, **_):
        from ..models.faster_rcnn import rcnn_get_bboxes, rpn_proposals
        from ..utils.det import Det
        scales = TridentFasterRCNN.anchor_scales()

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            # deploy fast path: single branch (dilation 2), plain C4 cost
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            props, _, pvalid = rpn_proposals(out.rpn, img_hw, nms_pre=1000,
                                             max_total=500, strides=(16,),
                                             scales=scales)
            d = rcnn_get_bboxes(
                lambda f: model.apply(
                    variables, f, method=TridentFasterRCNN.roi_forward),
                (out.c4,), props, pvalid, img_hw,
                num_classes=model.num_classes, scale_factor=scale_factors,
                score_thr=max(score_thr, 0.05), max_per_img=max_per_img,
                rescale=True, strides=(16,), out_size=14)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("tridentnet", build=build, losses=losses,
                    eval_step=eval_step, init_all=True)


_register()

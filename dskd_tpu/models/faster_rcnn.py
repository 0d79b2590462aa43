"""Faster R-CNN R50-FPN (parity: the reference's two-stage baseline —
configs/faster_rcnn, box AP 37.4; mmdet two_stage.py / rpn_head.py /
standard_roi_head.py / convfc_bbox_head.py).

TPU-native two-stage under fully static shapes:
  * RPN: 3x3 conv + 1x1 cls/reg over P2-P6, 3 anchors per cell
    (ratios 0.5/1/2, scale 8);
  * proposals: per-level pre-NMS topk, joint class-agnostic NMS to a fixed
    ``num_proposals``;
  * training samples 256 anchors (RPN) / 512 ROIs (RCNN) with RandomSampler
    semantics via random-key top-k;
  * RoIAlign: vectorized bilinear gather (ops/roi_align.py);
  * Shared2FC bbox head: 2x FC-1024, softmax CE over C+1, class-specific
    box deltas with the standard target means/stds.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core.anchors import base_anchors, bbox2delta, delta2bbox, grid_anchors
from ..core.max_iou_assigner import max_iou_assign, random_sample
from ..core.postprocess import batched_nms, filter_scores_and_topk
from ..ops.roi_align import multi_level_roi_align
from .fpn import FPN
from .resnet import ResNet

RCNN_TARGET_MEANS = (0.0, 0.0, 0.0, 0.0)
RCNN_TARGET_STDS = (0.1, 0.1, 0.2, 0.2)


class RPNOutputs(NamedTuple):
    cls_scores: Tuple[jnp.ndarray, ...]   # (B, H, W, A)
    bbox_preds: Tuple[jnp.ndarray, ...]   # (B, H, W, A*4)


class FasterRCNNOutputs(NamedTuple):
    rpn: RPNOutputs
    neck_feats: Tuple[jnp.ndarray, ...]


class RPNHead(nn.Module):
    num_anchors: int = 3
    feat_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> RPNOutputs:
        conv = nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                       kernel_init=nn.initializers.normal(0.01),
                       name="rpn_conv")
        cls = nn.Conv(self.num_anchors, (1, 1),
                      kernel_init=nn.initializers.normal(0.01),
                      name="rpn_cls")
        reg = nn.Conv(self.num_anchors * 4, (1, 1),
                      kernel_init=nn.initializers.normal(0.01),
                      name="rpn_reg")
        cls_out, reg_out = [], []
        for x in feats:
            y = nn.relu(conv(x))
            cls_out.append(cls(y))
            reg_out.append(reg(y))
        return RPNOutputs(tuple(cls_out), tuple(reg_out))


class FasterRCNN(nn.Module):
    """Two-stage detector; the ROI bbox head is a submodule so ONE
    variables pytree covers backbone+neck+rpn+roi (two_stage.py layout).

    ``__call__`` runs the first stage; ``roi_forward`` runs the second-stage
    head on RoIAligned features (use ``model.apply(vars, roi_feats,
    method=FasterRCNN.roi_forward)``). ``init_all`` traces both so init
    creates every parameter."""
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = 1
    # Libra R-CNN (configs/libra_rcnn): BFP balanced refinement after FPN
    use_bfp: bool = False
    # Double-Head R-CNN: fc cls branch + conv reg branch in the ROI head
    double_head: bool = False
    # Fast R-CNN (detectors/fast_rcnn.py): no RPN — proposals arrive from
    # outside (the reference reads precomputed proposal files)
    with_rpn: bool = True
    # necks/fpn_carafe.py: content-aware reassembly top-down upsampling
    # (configs/carafe/faster_rcnn_r50_fpn_carafe_1x_coco.py, AP 38.6)
    neck_upsample: str = "nearest"
    # gn / gn+ws recipe (configs/gn, configs/gn+ws): GroupNorm(32)
    # backbone+neck (norm='gn'), weight-standardized convs (ws=True),
    # and the Shared4Conv1FC ROI head
    norm: str = "frozen"
    ws: bool = False
    # backbone spec (models/backbones.py): the reference zoo pairings
    # configs/res2net, configs/resnest, configs/pvt, configs/swin,
    # configs/hrnet faster_rcnn variants. '' = ResNet(depth).
    backbone_spec: str = ""
    # 'fpn' (default) or 'pafpn' (configs/pafpn: bottom-up path
    # augmentation after the top-down pass, box AP 37.5)
    neck_kind: str = "fpn"
    # per-stage DCN (configs/dcn faster_rcnn_r50_fpn_dconv_c3-c5, AP 41.3;
    # modulated=dcnv2 configs/dcnv2 mdconv variants)
    dcn_stages: Tuple[bool, bool, bool, bool] = (False, False, False, False)
    # per-stage GeneralizedAttention (configs/empirical_attention)
    gen_attn_stages: Tuple[bool, bool, bool, bool] = (False, False,
                                                      False, False)
    gen_attn_type: str = "1111"
    # GRoIE bbox-roi extractor (configs/groie, generic_roi_extractor.py):
    # RoIAlign EVERY level -> shared pre conv5x5 -> sum -> post
    # GeneralizedAttention('0100', 6 heads, kv_stride 2)
    groie: bool = False

    def setup(self):
        gn = self.norm == "gn"
        self._hr = False
        if self.backbone_spec:
            from .backbones import build_backbone
            self.backbone, kind = build_backbone(
                self.backbone_spec, self.depth, self.frozen_stages)
            self._hr = kind == "hr"
        else:
            self.backbone = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                                   frozen_stages=self.frozen_stages,
                                   dcn_stages=tuple(self.dcn_stages),
                                   gen_attn_stages=tuple(
                                       self.gen_attn_stages),
                                   gen_attn_type=self.gen_attn_type,
                                   norm=self.norm, ws=self.ws)
        if self._hr:
            from .hrnet import HRFPN
            self.neck = HRFPN(out_channels=256, num_outs=5)
        elif self.neck_kind == "pafpn":
            from .pafpn import PAFPN
            self.neck = PAFPN(out_channels=256, num_outs=5, start_level=0,
                              add_extra_convs="")
        else:
            self.neck = FPN(out_channels=256, num_outs=5, start_level=0,
                            add_extra_convs="", upsample=self.neck_upsample,
                            norm="gn" if gn else "", ws=self.ws)
        if self.use_bfp:
            from .bfp import BFP
            self.bfp = BFP(refine_level=2)
        if self.with_rpn:
            self.rpn_head = RPNHead()
        if gn:
            self.roi_bbox_head = Conv4FC1BBoxHead(
                num_classes=self.num_classes, ws=self.ws)
        else:
            self.roi_bbox_head = (
                DoubleBBoxHead(num_classes=self.num_classes)
                if self.double_head else
                BBoxHead(num_classes=self.num_classes))
        if self.groie:
            self.roi_extractor = GRoIE()

    def __call__(self, images, img_hw, deterministic: bool = True):
        from .backbones import apply_backbone
        feats = apply_backbone(self.backbone, self.backbone_spec, images,
                               deterministic)
        neck = self.neck(feats)
        if self.use_bfp:
            neck = self.bfp(neck)
        rpn = self.rpn_head(neck) if self.with_rpn else None
        return FasterRCNNOutputs(rpn, neck)

    def roi_forward(self, roi_feats, train: bool = False):
        if self.double_head:
            return self.roi_bbox_head(roi_feats, train=train)
        return self.roi_bbox_head(roi_feats)

    def groie_forward(self, lvl_feats):
        """Aggregate (R, L, o, o, C) all-level ROI features (GRoIE)."""
        return self.roi_extractor(lvl_feats)

    def init_all(self, images, img_hw, deterministic: bool = True):
        out = self(images, img_hw, deterministic)
        c_roi = 512 if self.double_head else 256
        self.roi_bbox_head(jnp.zeros((1, 7, 7, c_roi), images.dtype))
        if self.groie:
            self.roi_extractor(jnp.zeros((1, 4, 7, 7, 256), images.dtype))
        return out


def scale_rois(rois: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Scale boxes about their centers (mmcv RoIAlign roi_scale_factor /
    SingleRoIExtractor.roi_rescale — Double-Head pools its reg branch at
    1.3x RoIs, double_roi_head.py:24 + configs/double_heads)."""
    c = (rois[..., :2] + rois[..., 2:]) * 0.5
    wh = (rois[..., 2:] - rois[..., :2]) * factor
    return jnp.concatenate([c - wh * 0.5, c + wh * 0.5], axis=-1)


def double_head_extract_fn(fpi, rois, valid):
    """Double-Head RoI pooling: [cls pool | reg pool at 1.3x RoIs], the
    pyramid LEVEL mapped on the unscaled boxes (double_roi_head.py:13-24
    roi_rescale happens after map_roi_levels). Shared by the train-step
    builder and the evaluator."""
    from ..ops.roi_align import multi_level_roi_align
    f_cls = multi_level_roi_align(fpi, rois, valid)
    f_reg = multi_level_roi_align(fpi, scale_rois(rois, 1.3), valid,
                                  level_rois=rois)
    return jnp.concatenate([f_cls, f_reg], -1)


class DoubleBBoxHead(nn.Module):
    """Double-Head R-CNN ROI head (parity: mmdet roi_heads/bbox_heads/
    double_bbox_head.py + roi_heads/double_roi_head.py +
    configs/double_heads, box AP 40.0): the classification branch is
    fully-connected (2x FC 1024) while the regression branch is
    convolutional — a BN'd BasicResBlock widening 256->1024 followed by
    ``num_convs`` BN'd ResNet Bottlenecks + GAP + FC. The reg branch
    pools its own RoI features at 1.3x-scaled RoIs
    (reg_roi_scale_factor, double_roi_head.py:13-24); the input here is
    the channel-concat [cls pool (256) | scaled reg pool (256)]."""
    num_classes: int = 80
    fc_channels: int = 1024
    conv_channels: int = 1024
    num_convs: int = 4

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray, train: bool = False):
        cin = roi_feats.shape[-1] // 2
        x_cls, x_reg = roi_feats[..., :cin], roi_feats[..., cin:]

        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5, name=name)

        # BasicResBlock (double_bbox_head.py:11-60): 3x3 BN ReLU ->
        # 1x1 BN (no act), + 1x1 BN identity projection, ReLU
        y = nn.relu(bn("res_bn1")(nn.Conv(
            cin, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            name="res_conv1")(x_reg)))
        y = bn("res_bn2")(nn.Conv(self.conv_channels, (1, 1),
                                  use_bias=False, name="res_conv2")(y))
        idn = bn("res_bn_id")(nn.Conv(self.conv_channels, (1, 1),
                                      use_bias=False,
                                      name="res_conv_id")(x_reg))
        y = nn.relu(y + idn)
        # num_convs ResNet Bottlenecks (planes = conv_channels // 4)
        p = self.conv_channels // 4
        for i in range(self.num_convs):
            z = nn.relu(bn(f"b{i}_bn1")(nn.Conv(
                p, (1, 1), use_bias=False, name=f"b{i}_conv1")(y)))
            z = nn.relu(bn(f"b{i}_bn2")(nn.Conv(
                p, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                name=f"b{i}_conv2")(z)))
            z = bn(f"b{i}_bn3")(nn.Conv(self.conv_channels, (1, 1),
                                        use_bias=False,
                                        name=f"b{i}_conv3")(z))
            y = nn.relu(y + z)
        y = y.mean(axis=(1, 2))                          # GAP
        reg = nn.Dense(self.num_classes * 4,
                       kernel_init=nn.initializers.normal(0.001),
                       name="fc_reg")(y)

        # fc (cls) branch on the UNSCALED pool
        x = x_cls.reshape(x_cls.shape[0], -1)
        # convfc_bbox_head init_cfg: branch FCs Xavier-uniform
        xav = nn.initializers.xavier_uniform()
        x = nn.relu(nn.Dense(self.fc_channels, kernel_init=xav,
                             name="cls_fc0")(x))
        x = nn.relu(nn.Dense(self.fc_channels, kernel_init=xav,
                             name="cls_fc1")(x))
        cls = nn.Dense(self.num_classes + 1,
                       kernel_init=nn.initializers.normal(0.01),
                       name="fc_cls")(x)
        return cls, reg


class BBoxHead(nn.Module):
    """Shared2FCBBoxHead: flatten -> 2x FC 1024 -> cls (C+1) + reg (C*4).

    ``seesaw``: SeesawLoss's custom_cls_channels contract
    (losses/seesaw_loss.py:138-155) — the classifier emits C class
    logits plus a 2-channel pos/neg objectness instead of C+1."""
    num_classes: int = 80
    fc_channels: int = 1024
    seesaw: bool = False

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        # convfc_bbox_head init_cfg: shared FCs Xavier-uniform
        xav = nn.initializers.xavier_uniform()
        x = nn.relu(nn.Dense(self.fc_channels, kernel_init=xav,
                             name="shared_fc0")(x))
        x = nn.relu(nn.Dense(self.fc_channels, kernel_init=xav,
                             name="shared_fc1")(x))
        if self.seesaw:
            # the seesaw recipe pairs the loss with a NormedLinear
            # classifier (configs/seesaw_loss/*: cls_predictor_cfg
            # NormedLinear tempearture=20)
            from .normed_predictor import NormedDense
            cls = NormedDense(self.num_classes + 2, name="fc_cls")(x)
        else:
            cls = nn.Dense(self.num_classes + 1,
                           kernel_init=nn.initializers.normal(0.01),
                           name="fc_cls")(x)
        reg = nn.Dense(self.num_classes * 4,
                       kernel_init=nn.initializers.normal(0.001),
                       name="fc_reg")(x)
        return cls, reg


class Conv4FC1BBoxHead(nn.Module):
    """Shared4Conv1FCBBoxHead with GN(+WS) convs — the configs/gn and
    configs/gn+ws ROI head (4x [conv3x3 -> GN(32) -> relu] -> FC 1024 ->
    cls (C+1) + reg (C*4))."""
    num_classes: int = 80
    conv_channels: int = 256
    fc_channels: int = 1024
    ws: bool = True

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        if self.ws:
            from .conv_ws import ConvWS as _C
        else:
            _C = nn.Conv
        x = roi_feats
        for i in range(4):
            x = _C(self.conv_channels, (3, 3), padding=[(1, 1), (1, 1)],
                   use_bias=False, name=f"shared_conv{i}")(x)
            x = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                     name=f"shared_gn{i}")(x))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_channels, name="shared_fc0")(x))
        cls = nn.Dense(self.num_classes + 1,
                       kernel_init=nn.initializers.normal(0.01),
                       name="fc_cls")(x)
        reg = nn.Dense(self.num_classes * 4,
                       kernel_init=nn.initializers.normal(0.001),
                       name="fc_reg")(x)
        return cls, reg


class GRoIE(nn.Module):
    """GenericRoIExtractor aggregation (parity: mmdet roi_heads/
    roi_extractors/generic_roi_extractor.py:46-86 + configs/groie/
    faster_rcnn_r50_fpn_groie_1x_coco.py, box AP 38.3): every FPN level
    is RoIAligned for every ROI, a SHARED pre ConvModule(5x5)+ReLU runs
    per level, the levels are summed, and a GeneralizedAttention
    post-module ('0100' = query-content x relative-position, 6 heads,
    kv_stride 2) refines the aggregate. Input (R, L, o, o, C) from
    ops/roi_align.all_level_roi_align."""
    channels: int = 256
    post_heads: int = 6
    post_type: str = "0100"

    @nn.compact
    def __call__(self, lvl_feats: jnp.ndarray) -> jnp.ndarray:
        from .plugins import GeneralizedAttention
        R, Lv, o, _, C = lvl_feats.shape
        x = nn.Conv(self.channels, (5, 5), padding=[(2, 2), (2, 2)],
                    name="pre_conv")(lvl_feats.reshape(R * Lv, o, o, C))
        x = nn.relu(x).reshape(R, Lv, o, o, self.channels).sum(axis=1)
        return GeneralizedAttention(
            num_heads=self.post_heads, attention_type=self.post_type,
            kv_stride=2, name="post_attn")(x)


def rpn_anchors(featmap_sizes, strides=(4, 8, 16, 32, 64),
                scales=(8.0,), ratios=(0.5, 1.0, 2.0)):
    return [grid_anchors((h, w), s, base_anchors(s, scales, ratios))
            for (h, w), s in zip(featmap_sizes, strides)]


def rpn_proposals(rpn: RPNOutputs, img_hw, nms_pre: int = 1000,
                  max_total: int = 1000, nms_iou: float = 0.7,
                  min_box_size: float = 0.0,
                  strides=(4, 8, 16, 32, 64), scales=(8.0,)):
    """Proposal generation, static shapes. Returns (B, max_total, 4) + valid."""
    B = rpn.cls_scores[0].shape[0]
    featmap_sizes = [c.shape[1:3] for c in rpn.cls_scores]
    anchors = rpn_anchors(featmap_sizes, strides, scales)

    lvl_boxes, lvl_scores, lvl_ids = [], [], []
    for i, (c, r) in enumerate(zip(rpn.cls_scores, rpn.bbox_preds)):
        a = anchors[i]
        n = a.shape[0]
        scores = jax.nn.sigmoid(c.reshape(B, n))
        deltas = r.reshape(B, n, 4)
        k = min(nms_pre, n)
        top_s, top_i = jax.lax.top_k(scores, k)               # (B, k)
        sel_a = a[top_i]                                      # (B, k, 4)
        sel_d = jnp.take_along_axis(deltas, top_i[..., None], axis=1)
        boxes = delta2bbox(sel_a, sel_d)
        lvl_boxes.append(boxes)
        lvl_scores.append(top_s)
        lvl_ids.append(jnp.full((B, k), i, jnp.int32))
    boxes = jnp.concatenate(lvl_boxes, 1)
    scores = jnp.concatenate(lvl_scores, 1)
    ids = jnp.concatenate(lvl_ids, 1)

    def per_image(bx, sc, lid, hw):
        h, w = hw[0].astype(bx.dtype), hw[1].astype(bx.dtype)
        bx = jnp.stack([jnp.clip(bx[:, 0], 0, w), jnp.clip(bx[:, 1], 0, h),
                        jnp.clip(bx[:, 2], 0, w), jnp.clip(bx[:, 3], 0, h)],
                       -1)
        ok = ((bx[:, 2] - bx[:, 0] > min_box_size)
              & (bx[:, 3] - bx[:, 1] > min_box_size))
        # NMS across levels, class-agnostic but level-separated (the
        # reference NMSes with level ids as classes)
        nb, ns, _, keep, _ = batched_nms(bx, sc, lid, nms_iou, max_total,
                                         valid=ok)
        return nb, ns, keep

    return jax.vmap(per_image)(boxes, scores, ids, img_hw)


class RPN(nn.Module):
    """Standalone Region Proposal Network (parity: detectors/rpn.py +
    configs/rpn/rpn_r50_fpn_1x_coco.py, AR@1000 58.2): backbone + FPN +
    RPNHead with no second stage; proposals ARE the detections
    (class-agnostic, evaluated with the proposal/AR protocol)."""
    num_classes: int = 1                 # class-agnostic by construction
    depth: int = 50
    frozen_stages: int = 1

    @nn.compact
    def __call__(self, images, img_hw, deterministic: bool = True):
        feats = ResNet(depth=self.depth, out_indices=(0, 1, 2, 3),
                       frozen_stages=self.frozen_stages,
                       name="backbone")(images)
        neck = FPN(out_channels=256, num_outs=5, start_level=0,
                   add_extra_convs="", name="neck")(feats)
        return FasterRCNNOutputs(RPNHead(name="rpn_head")(neck), neck)


class RPNLossConfig(NamedTuple):
    num_samples: int = 256
    pos_fraction: float = 0.5
    pos_iou_thr: float = 0.7
    neg_iou_thr: float = 0.3
    min_pos_iou: float = 0.3
    cls_weight: float = 1.0
    bbox_weight: float = 1.0


def rpn_loss(rpn: RPNOutputs, gt_bboxes, gt_valid, img_hw, rng,
             cfg: RPNLossConfig, strides=(4, 8, 16, 32, 64),
             scales=(8.0,)):
    """RPN losses: binary CE on sampled anchors + L1 on positives."""
    B = rpn.cls_scores[0].shape[0]
    featmap_sizes = [c.shape[1:3] for c in rpn.cls_scores]
    anchors = jnp.concatenate(rpn_anchors(featmap_sizes, strides, scales), 0)
    N = anchors.shape[0]
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1) for c in rpn.cls_scores], 1)
    reg_flat = jnp.concatenate(
        [r.reshape(B, -1, 4) for r in rpn.bbox_preds], 1)

    gt_labels = jnp.zeros(gt_bboxes.shape[:2], jnp.int32)  # class-agnostic

    def per_image(r, gtb, gtv):
        assign = max_iou_assign(anchors, gtb, gt_labels[0], gtv, 1,
                                cfg.pos_iou_thr, cfg.neg_iou_thr,
                                cfg.min_pos_iou)
        sample = random_sample(r, assign.assigned_gt, cfg.num_samples,
                               cfg.pos_fraction)
        return assign.assigned_gt, sample

    rngs = jax.random.split(rng, B)
    assigned, samples = jax.vmap(per_image)(rngs, gt_bboxes, gt_valid)

    # classification: BCE at sampled anchors, target 1 at positives
    pos_idx, pos_valid = samples.pos_idx, samples.pos_valid
    neg_idx, neg_valid = samples.neg_idx, samples.neg_valid
    num_total = jnp.maximum(
        pos_valid.sum() + neg_valid.sum(), 1).astype(jnp.float32)

    pos_logit = jnp.take_along_axis(cls_flat, pos_idx, axis=1)
    neg_logit = jnp.take_along_axis(cls_flat, neg_idx, axis=1)
    loss_cls = (
        (L.binary_cross_entropy_with_logits(pos_logit, jnp.ones_like(
            pos_logit)) * pos_valid).sum()
        + (L.binary_cross_entropy_with_logits(neg_logit, jnp.zeros_like(
            neg_logit)) * neg_valid).sum()) / num_total

    # bbox: L1 on delta targets at sampled positives
    G = gt_bboxes.shape[1]
    pos_assigned = jnp.take_along_axis(assigned, pos_idx, axis=1)
    safe = jnp.clip(pos_assigned, 0, G - 1)
    tgt_boxes = jnp.take_along_axis(gt_bboxes, safe[..., None], axis=1)
    pos_anchor = anchors[pos_idx]                       # (B, P, 4)
    deltas_tgt = bbox2delta(pos_anchor, tgt_boxes)
    deltas_pred = jnp.take_along_axis(reg_flat, pos_idx[..., None], axis=1)
    loss_bbox = (jnp.abs(deltas_pred - deltas_tgt).sum(-1)
                 * pos_valid).sum() / num_total

    return dict(loss_rpn_cls=cfg.cls_weight * loss_cls,
                loss_rpn_bbox=cfg.bbox_weight * loss_bbox)


class RCNNSamples(NamedTuple):
    """Sampled-ROI layout from rcnn_forward_train: positives FIRST
    (pos slots then neg slots) so mask-branch consumers can slice a
    static leading block instead of gathering."""
    rois: jnp.ndarray        # (B, S, 4)
    valid: jnp.ndarray       # (B, S) sampled-slot validity
    is_pos: jnp.ndarray      # (B, S)
    labels: jnp.ndarray      # (B, S) class or C for background
    gt_idx: jnp.ndarray      # (B, S) matched GT index (clipped)
    acc_pos: jnp.ndarray     # scalar positive count


class RCNNLossConfig(NamedTuple):
    num_classes: int = 80
    num_samples: int = 512
    pos_fraction: float = 0.25
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    min_pos_iou: float = 0.5
    # Double-Head R-CNN: both branch losses weighted 2.0 and SmoothL1
    # beta=1.0 (configs/double_heads/dh_faster_rcnn_r50_fpn_1x_coco.py);
    # smooth_l1_beta=0 keeps the default plain-L1 recipe
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.0
    smooth_l1_beta: float = 0.0
    # Libra R-CNN options: balanced L1 bbox loss + IoU-balanced negatives
    balanced_l1: bool = False
    iou_balanced_neg: bool = False
    # TridentNet's C4 config samples without GT-as-proposals
    add_gt_as_proposals: bool = True
    # PISA (roi_heads/pisa_roi_head.py): ISR-P cls reweighting + CARL
    pisa: bool = False
    # PISA's ISR-N half (ScoreHLRSampler, samplers/score_hlr_sampler.py):
    # importance-ranked negative sampling + per-negative CE weights,
    # fed by a stop-gradient head pass over all candidate ROIs
    isr_n: bool = False
    hlr_k: float = 0.5
    hlr_bias: float = 0.0
    # Dynamic R-CNN (roi_heads/dynamic_roi_head.py): assignment IoU and
    # SmoothL1 beta follow the batch statistics (the reference keeps a
    # 100-iter history; here the CURRENT batch's statistics apply
    # directly — the windowless in-graph equivalent, documented)
    dynamic: bool = False
    dynamic_iou_topk: int = 75
    dynamic_beta_topk: int = 10
    dynamic_initial_iou: float = 0.4
    dynamic_initial_beta: float = 1.0
    # SeesawLoss ROI classification (losses/seesaw_loss.py; configs/
    # seesaw_loss: p=0.8, q=2.0, eps=1e-2): class logits + a 2-channel
    # objectness head; pass ``seesaw_cum`` to rcnn_forward_train
    seesaw: bool = False
    seesaw_p: float = 0.8
    seesaw_q: float = 2.0
    seesaw_eps: float = 1e-2


def rcnn_forward_train(bbox_head_apply, neck_feats, proposals,
                       proposal_valid, gt_bboxes, gt_labels, gt_valid, rng,
                       cfg: RCNNLossConfig, strides=(4, 8, 16, 32),
                       out_size: int = 7, seesaw_cum=None,
                       extract_fn=None):
    """Sample ROIs (GT boxes appended as in the reference's add_gt_as_
    proposals), extract RoIAlign features, compute CE + L1 losses.

    ``cfg.seesaw`` (requires ``seesaw_cum``, the (C+1,) per-class sample
    count state): seesaw CE over class logits on POSITIVE rows + softmax
    CE over the 2-channel objectness on all valid rows
    (seesaw_loss.py:279-302), and the return becomes
    (losses, samples, new_seesaw_cum)."""
    B = proposals.shape[0]
    G = gt_bboxes.shape[1]
    C = cfg.num_classes
    if cfg.add_gt_as_proposals:
        rois_all = jnp.concatenate([proposals, gt_bboxes], axis=1)
        rois_valid = jnp.concatenate([proposal_valid, gt_valid], axis=1)
    else:
        rois_all, rois_valid = proposals, proposal_valid

    if cfg.dynamic:
        # Dynamic R-CNN: the assignment threshold is the batch mean of
        # each image's iou_topk-th largest proposal IoU, floored at the
        # initial 0.4 (dynamic_roi_head.py:77-85 + update rule)
        from ..core.boxes import bbox_overlaps as _ov

        def img_kth(rois, rv, gtb, gtv):
            mi = jnp.where(gtv[None], _ov(rois, gtb), 0.0).max(-1)
            mi = jnp.where(rv, mi, 0.0)
            k = min(cfg.dynamic_iou_topk, mi.shape[0])
            return jax.lax.top_k(mi, k)[0][-1]

        kth = jax.vmap(img_kth)(rois_all, rois_valid, gt_bboxes, gt_valid)
        dyn_iou = jnp.maximum(cfg.dynamic_initial_iou, kth.mean())
        pos_thr = neg_thr = min_thr = dyn_iou
    else:
        pos_thr, neg_thr = cfg.pos_iou_thr, cfg.neg_iou_thr
        min_thr = cfg.min_pos_iou

    # RoIAlign over levels (P2-P5), per image; extract_fn overrides the
    # default FPN-level-mapped extraction (GRoIE aggregates all levels)
    feats_per_img = [tuple(f[b] for f in neck_feats[:4]) for b in range(B)]
    _extract = extract_fn or (
        lambda fpi, r, v: multi_level_roi_align(
            fpi, r, v, strides=strides, out_size=out_size))

    hlr_inputs = ()
    if cfg.isr_n:
        # ScoreHLR (ISR-N) scoring pass: the reference's no-grad
        # `_bbox_forward` over candidate negatives
        # (pisa_roi_head.py:48-64 + score_hlr_sampler.py:133-152) — here
        # one stop-gradient head pass over EVERY candidate ROI
        Sa = rois_all.shape[1]
        feats_all = jnp.stack([
            _extract(feats_per_img[b], rois_all[b], rois_valid[b])
            for b in range(B)])
        lg_all, rg_all = bbox_head_apply(
            feats_all.reshape(B * Sa, out_size, out_size, -1))
        lg_all = jax.lax.stop_gradient(lg_all)
        rg_all = jax.lax.stop_gradient(rg_all)
        probs_all = jax.nn.softmax(lg_all, -1)
        h_score = probs_all[:, :C].max(-1)
        h_cls = probs_all[:, :C].argmax(-1)
        rg_sel = jnp.take_along_axis(
            rg_all.reshape(B * Sa, C, 4),
            h_cls[:, None, None].repeat(4, -1), axis=1)[:, 0]
        h_box = delta2bbox(rois_all.reshape(-1, 4), rg_sel,
                           means=RCNN_TARGET_MEANS,
                           stds=RCNN_TARGET_STDS)
        # background CE of each candidate (ori_loss in the reference)
        h_loss = -jnp.log(jnp.maximum(probs_all[:, C], 1e-12))
        hlr_inputs = (h_score.reshape(B, Sa), h_box.reshape(B, Sa, 4),
                      h_loss.reshape(B, Sa))

    num_pos_max = int(cfg.num_samples * cfg.pos_fraction)

    def per_image(r, rois, rv, gtb, gtl, gtv, *hlr):
        assign = max_iou_assign(rois, gtb, gtl, gtv, C,
                                pos_thr, neg_thr,
                                min_thr, match_low_quality=False)
        # invalid rois can never be sampled
        a = jnp.where(rv, assign.assigned_gt, -2)
        neg_w = jnp.ones((cfg.num_samples - num_pos_max,), jnp.float32)
        if cfg.isr_n:
            from ..core.max_iou_assigner import score_hlr_sample
            res = score_hlr_sample(r, a, hlr[0], hlr[1], hlr[2],
                                   cfg.num_samples, cfg.pos_fraction,
                                   k=cfg.hlr_k, bias=cfg.hlr_bias)
            sample, neg_w = res.sample, res.neg_label_weights
        elif cfg.iou_balanced_neg:
            from ..core.max_iou_assigner import iou_balanced_sample
            sample = iou_balanced_sample(r, a, assign.max_ious,
                                         cfg.num_samples,
                                         cfg.pos_fraction)
        else:
            sample = random_sample(r, a, cfg.num_samples, cfg.pos_fraction)
        idx = jnp.concatenate([sample.pos_idx, sample.neg_idx])
        valid = jnp.concatenate([sample.pos_valid, sample.neg_valid])
        is_pos = jnp.concatenate([sample.pos_valid,
                                  jnp.zeros_like(sample.neg_valid)])
        sampled_rois = rois[idx]
        assigned = a[idx]
        safe = jnp.clip(assigned, 0, G - 1)
        labels = jnp.where(is_pos, gtl[safe].astype(jnp.int32), C)
        tgt_box = gtb[safe]
        w_slots = jnp.concatenate([jnp.ones((num_pos_max,), jnp.float32),
                                   neg_w])
        return sampled_rois, valid, is_pos, labels, tgt_box, safe, w_slots

    rngs = jax.random.split(rng, B)
    (rois, valid, is_pos, labels, tgt_boxes, gt_idx,
     w_slots) = jax.vmap(per_image)(
        rngs, rois_all, rois_valid, gt_bboxes, gt_labels, gt_valid,
        *hlr_inputs)

    roi_feats = jnp.stack([
        _extract(feats_per_img[b], rois[b], valid[b])
        for b in range(B)])                         # (B, S, out, out, 256)

    S = rois.shape[1]
    cls_logits, reg = bbox_head_apply(
        roi_feats.reshape(B * S, out_size, out_size, -1))
    labels_flat = labels.reshape(-1)
    valid_flat = valid.reshape(-1).astype(jnp.float32)
    is_pos_flat = is_pos.reshape(-1)

    num_total = jnp.maximum(valid_flat.sum(), 1.0)
    new_seesaw_cum = None
    if cfg.seesaw:
        # accumulate per-class sample counts (incl. background slot C —
        # seesaw_loss.py:229-233 counts every sampled row)
        new_seesaw_cum = seesaw_cum + jnp.bincount(
            jnp.where(valid_flat > 0, labels_flat, C),
            weights=valid_flat, length=C + 1)
        cls_classes = cls_logits[:, :C]
        cls_obj = cls_logits[:, C:]
        pos_w = is_pos_flat.astype(jnp.float32) * valid_flat
        num_pos = jnp.maximum(pos_w.sum(), 1.0)
        loss_cls_classes = L.seesaw_ce_loss(
            cls_classes, labels_flat, jax.lax.stop_gradient(
                new_seesaw_cum), C, p=cfg.seesaw_p, q=cfg.seesaw_q,
            eps=cfg.seesaw_eps, weight=pos_w, avg_factor=num_pos)
        obj_labels = (labels_flat == C).astype(jnp.int32)
        loss_cls_obj = L.cross_entropy_loss(
            cls_obj, obj_labels, weight=valid_flat, avg_factor=num_total)
        loss_cls = loss_cls_classes + loss_cls_obj
        # the regression gather below indexes class logits only
        cls_logits = cls_classes
    else:
        # w_slots carries the ScoreHLR per-negative weights (ones unless
        # cfg.isr_n; pisa_roi_head.py:115-124 maps them into label_weights)
        loss_cls = cfg.loss_cls_weight * L.cross_entropy_loss(
            cls_logits, labels_flat,
            weight=valid_flat * w_slots.reshape(-1),
            avg_factor=num_total)

    # class-specific deltas at the target class
    reg = reg.reshape(B * S, C, 4)
    safe_lab = jnp.clip(labels_flat, 0, C - 1)
    reg_at = jnp.take_along_axis(
        reg, safe_lab[:, None, None].repeat(4, -1), axis=1)[:, 0]
    deltas_tgt = bbox2delta(rois.reshape(-1, 4), tgt_boxes.reshape(-1, 4),
                            means=RCNN_TARGET_MEANS, stds=RCNN_TARGET_STDS)
    if cfg.balanced_l1:
        per = L.balanced_l1_loss(reg_at, deltas_tgt,
                                 reduction="none").sum(-1)
    elif cfg.dynamic:
        # SmoothL1 whose beta is the batch's beta_topk*B-th smallest
        # positive |target| (capped at the initial 1.0); ~zero medians
        # keep the initial beta (dynamic_roi_head.py update rule)
        err = jnp.abs(deltas_tgt[:, :2]).mean(-1)
        errp = jnp.where(is_pos_flat > 0, err, jnp.inf)
        k = min(cfg.dynamic_beta_topk * B, errp.shape[0])
        kth_err = -jax.lax.top_k(-errp, k)[0][-1]
        beta = jnp.where(jnp.isfinite(kth_err) & (kth_err > 1e-7),
                         jnp.minimum(cfg.dynamic_initial_beta, kth_err),
                         cfg.dynamic_initial_beta)
        d = jnp.abs(reg_at - deltas_tgt)
        per = jnp.where(d < beta, 0.5 * d * d / beta,
                        d - 0.5 * beta).sum(-1)
    elif cfg.smooth_l1_beta > 0:
        d = jnp.abs(reg_at - deltas_tgt)
        b = cfg.smooth_l1_beta
        per = jnp.where(d < b, 0.5 * d * d / b, d - 0.5 * b).sum(-1)
    else:
        per = jnp.abs(reg_at - deltas_tgt).sum(-1)
    loss_bbox = cfg.loss_bbox_weight * (per * is_pos_flat).sum() / num_total

    losses = dict(loss_cls=loss_cls, loss_bbox=loss_bbox)
    if cfg.pisa:
        from .pisa import carl_loss, isr_p_weights
        gt_off = (gt_idx + jnp.arange(B)[:, None] * G).reshape(-1)
        imp = isr_p_weights(
            jax.lax.stop_gradient(cls_logits),
            jax.lax.stop_gradient(reg_at), rois.reshape(-1, 4),
            labels_flat, is_pos_flat > 0, gt_off,
            jax.lax.stop_gradient(deltas_tgt), C, loss_kind="ce",
            target_stds=RCNN_TARGET_STDS)
        imp = jax.lax.stop_gradient(imp)
        losses["loss_cls"] = L.cross_entropy_loss(
            cls_logits, labels_flat,
            weight=valid_flat * w_slots.reshape(-1) * imp,
            avg_factor=num_total)
        losses["loss_carl"] = carl_loss(
            cls_logits, labels_flat, is_pos_flat > 0, reg_at,
            jax.lax.stop_gradient(deltas_tgt), num_total, C,
            sigmoid=False)

    acc_pos = is_pos_flat.sum()
    samples = RCNNSamples(rois, valid, is_pos, labels, gt_idx, acc_pos)
    if cfg.seesaw:
        return losses, samples, new_seesaw_cum
    return losses, samples


def rcnn_get_bboxes(bbox_head_apply, neck_feats, proposals, proposal_valid,
                    img_hw, num_classes: int, scale_factor=None,
                    score_thr: float = 0.05, nms_iou: float = 0.5,
                    max_per_img: int = 100, rescale: bool = False,
                    strides=(4, 8, 16, 32), out_size: int = 7,
                    seesaw: bool = False, extract_fn=None,
                    nms_pre: int = 1000):
    """Second-stage decode + per-class NMS, static shapes.

    ``seesaw``: SeesawLoss.get_activation (seesaw_loss.py:156-176) —
    class softmax scaled by the objectness positive probability.

    ``nms_pre`` caps the (box, class) candidates entering NMS at the
    top-k by score — without it the static-shape multiclass_nms
    equivalent would suppress over all S*C = 80k pairs (an 80k x 80k
    IoU matrix; the reference's dynamic shapes only ever see the few
    hundred pairs above score_thr). Candidates ranked below the top
    1000 by score cannot realistically enter a 100-detection output."""
    B, S = proposals.shape[:2]
    feats_per_img = [tuple(f[b] for f in neck_feats[:4]) for b in range(B)]
    _extract = extract_fn or (
        lambda fpi, r, v: multi_level_roi_align(
            fpi, r, v, strides=strides, out_size=out_size))
    roi_feats = jnp.stack([
        _extract(feats_per_img[b], proposals[b], proposal_valid[b])
        for b in range(B)])
    cls_logits, reg = bbox_head_apply(
        roi_feats.reshape(B * S, out_size, out_size, -1))
    if seesaw:
        score_classes = jax.nn.softmax(cls_logits[:, :num_classes], -1)
        score_obj = jax.nn.softmax(cls_logits[:, num_classes:], -1)
        probs = score_classes * score_obj[:, :1]
    else:
        probs = jax.nn.softmax(cls_logits, -1)[:, :num_classes]
    probs = probs.reshape(B, S, num_classes)
    reg = reg.reshape(B, S, num_classes, 4)

    def per_image(rois, rv, p, r, hw, sf):
        # top-k (box, class) pairs above score_thr, THEN decode + NMS on
        # just those (multiclass_nms semantics at static shapes)
        p = jnp.where(rv[:, None], p, 0.0)
        top = filter_scores_and_topk(p, score_thr,
                                     min(nms_pre, S * num_classes))
        sel_rois = rois[top.keep_idxs]                       # (k, 4)
        sel_reg = r[top.keep_idxs, top.labels]               # (k, 4)
        boxes = delta2bbox(sel_rois, sel_reg, means=RCNN_TARGET_MEANS,
                           stds=RCNN_TARGET_STDS)
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
    nb, ns, nl, keep = jax.vmap(per_image)(
        proposals, proposal_valid, probs, reg, img_hw, scale_factor)
    return dict(bboxes=nb, scores=ns, labels=nl, valid=keep)


# --- family registrations (dskd_tpu/registry.py) ------------------------
# faster_rcnn + its 8 config variants, fast_rcnn (external-proposal
# stand-in), and the bare RPN all live in this module.

_FASTER_VARIANTS = ("faster_rcnn", "libra_faster_rcnn",
                    "double_head_rcnn", "carafe_faster_rcnn",
                    "pisa_faster_rcnn", "dynamic_rcnn",
                    "faster_rcnn_gn_ws", "faster_rcnn_gn",
                    "faster_rcnn_pafpn")


def _register():
    from ..registry import register_family

    def build_faster(cfg, arch):
        m = cfg.model
        gn = arch in ("faster_rcnn_gn_ws", "faster_rcnn_gn")
        return FasterRCNN(num_classes=m.num_classes, depth=m.depth,
                          frozen_stages=m.frozen_stages,
                          use_bfp=(arch == "libra_faster_rcnn"),
                          double_head=(arch == "double_head_rcnn"),
                          neck_upsample=("carafe"
                                         if arch == "carafe_faster_rcnn"
                                         else "nearest"),
                          norm="gn" if gn else "frozen",
                          ws=(arch == "faster_rcnn_gn_ws"),
                          backbone_spec=m.backbone,
                          neck_kind=("pafpn"
                                     if arch == "faster_rcnn_pafpn"
                                     else "fpn"),
                          dcn_stages=tuple(m.dcn_stages),
                          gen_attn_stages=tuple(m.gen_attn_stages),
                          gen_attn_type=m.gen_attn_type,
                          groie=m.groie)

    def losses_faster(model, cfg, *, arch, **_):
        rpn_cfg = RPNLossConfig()
        libra = arch == "libra_faster_rcnn"
        dh = arch == "double_head_rcnn"
        rcnn_cfg = RCNNLossConfig(num_classes=cfg.model.num_classes,
                                  num_samples=cfg.rcnn_num_samples,
                                  balanced_l1=libra,
                                  iou_balanced_neg=libra,
                                  # Double-Head: 2.0 cls/bbox weights +
                                  # SmoothL1 beta 1 (configs/double_heads)
                                  loss_cls_weight=2.0 if dh else 1.0,
                                  loss_bbox_weight=2.0 if dh else 1.0,
                                  smooth_l1_beta=1.0 if dh else 0.0,
                                  pisa=(arch == "pisa_faster_rcnn"),
                                  isr_n=(arch == "pisa_faster_rcnn"),
                                  dynamic=(arch == "dynamic_rcnn"))
        stoch_bb = cfg.model.backbone.startswith(("effb", "swin", "pvt"))

        def losses_fn(variables, batch, teacher_vars, rng):
            rng1, rng2, rng3 = jax.random.split(rng, 3)
            out = model.apply(variables, batch.images, batch.img_hw,
                              deterministic=not stoch_bb,
                              rngs={"dropout": rng3} if stoch_bb else None)
            losses = rpn_loss(out.rpn, batch.gt_bboxes, batch.gt_valid,
                              batch.img_hw, rng1, rpn_cfg)
            # proposals are detached (the reference never backprops
            # through NMS'd proposals into the RPN)
            props, _, valid = rpn_proposals(out.rpn, batch.img_hw,
                                            nms_pre=1000,
                                            max_total=cfg.rcnn_num_proposals)
            props = jax.lax.stop_gradient(props)
            extract_fn = None
            if getattr(model, "groie", False):
                from ..ops.roi_align import all_level_roi_align

                def extract_fn(fpi, r, v):
                    return model.apply(
                        variables, all_level_roi_align(fpi, r, v),
                        method=FasterRCNN.groie_forward)
            head_apply = lambda f: model.apply(
                variables, f, method=FasterRCNN.roi_forward)
            mut_stats = {}
            if dh:
                extract_fn = double_head_extract_fn

                def head_apply(f):
                    (c, r), mut = model.apply(
                        variables, f, True,
                        method=FasterRCNN.roi_forward,
                        mutable=["batch_stats"])
                    mut_stats["bs"] = mut["batch_stats"]
                    return c, r
            rcnn_losses, _ = rcnn_forward_train(
                head_apply,
                out.neck_feats, props, valid, batch.gt_bboxes,
                batch.gt_labels, batch.gt_valid, rng2, rcnn_cfg,
                extract_fn=extract_fn)
            losses.update({f"rcnn_{k}": v for k, v in rcnn_losses.items()})
            if dh:
                # merge the head's updated BN stats over the frozen
                # backbone stats so the train step can thread them
                bs = dict(variables.get("batch_stats", {}))
                bs.update(mut_stats["bs"])
                return losses, bs
            return losses, None
        return losses_fn

    def eval_faster(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            props, _, pvalid = rpn_proposals(out.rpn, img_hw, nms_pre=1000,
                                             max_total=1000)
            extract_fn = None
            if getattr(model, "groie", False):
                from ..ops.roi_align import all_level_roi_align

                def extract_fn(fpi, r, v):
                    return model.apply(
                        variables, all_level_roi_align(fpi, r, v),
                        method=FasterRCNN.groie_forward)
            if getattr(model, "double_head", False):
                extract_fn = double_head_extract_fn
            d = rcnn_get_bboxes(
                lambda f: model.apply(variables, f,
                                      method=FasterRCNN.roi_forward),
                out.neck_feats, props, pvalid, img_hw,
                num_classes=model.num_classes, scale_factor=scale_factors,
                score_thr=max(score_thr, 0.05), max_per_img=max_per_img,
                rescale=True, extract_fn=extract_fn)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    for name in _FASTER_VARIANTS:
        register_family(
            name,
            build=(lambda cfg, _a=name: build_faster(cfg, _a)),
            losses=(lambda model, cfg, _a=name, **kw:
                    losses_faster(model, cfg, arch=_a, **kw)),
            eval_step=eval_faster, init_all=True)

    # ---- fast_rcnn (external proposals; documented stand-ins) ----
    def build_fast(cfg):
        m = cfg.model
        return FasterRCNN(num_classes=m.num_classes, depth=m.depth,
                          frozen_stages=m.frozen_stages, with_rpn=False)

    def losses_fast(model, cfg, **_):
        rcnn_cfg = RCNNLossConfig(num_classes=cfg.model.num_classes,
                                  num_samples=cfg.rcnn_num_samples)

        def losses_fn(variables, batch, teacher_vars, rng):
            # Fast R-CNN consumes EXTERNAL proposals (the reference's
            # precomputed .pkl files). Absent proposal files in this
            # environment, jittered GT boxes stand in for the
            # high-recall proposal distribution (documented).
            rng1, rng2 = jax.random.split(rng)
            G = batch.gt_bboxes.shape[1]
            reps = max(1, cfg.rcnn_num_proposals // max(G, 1))
            base = jnp.tile(batch.gt_bboxes, (1, reps, 1))
            noise = jax.random.normal(rng1, base.shape) * 8.0
            props = base + noise
            valid = jnp.tile(batch.gt_valid, (1, reps))
            out = model.apply(variables, batch.images, batch.img_hw)
            losses, _ = rcnn_forward_train(
                lambda f: model.apply(variables, f,
                                      method=FasterRCNN.roi_forward),
                out.neck_feats, props, valid, batch.gt_bboxes,
                batch.gt_labels, batch.gt_valid, rng2, rcnn_cfg)
            return losses, None
        return losses_fn

    def eval_fast(model, *, score_thr, max_per_img, **_):
        from ..core.anchors import base_anchors, grid_anchors
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            # Fast R-CNN consumes EXTERNAL proposals (the reference reads
            # precomputed .pkl files, detectors/fast_rcnn.py). Absent
            # proposal files, a static multi-scale class-agnostic box
            # grid stands in (same documented stand-in as the train
            # branch) — the RCNN head scores and refines every grid box.
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            B, H, W = images.shape[:3]
            grids = [grid_anchors((H // s, W // s), s,
                                  base_anchors(float(s), (4.0, 8.0),
                                               (0.5, 1.0, 2.0)))
                     for s in (16, 32, 64)]
            props = jnp.concatenate(grids, 0)
            stride = max(1, props.shape[0] // 1000)
            props = props[::stride][:1000]
            props = jnp.broadcast_to(props[None], (B,) + props.shape)
            pvalid = jnp.ones(props.shape[:2], bool)
            d = rcnn_get_bboxes(
                lambda f: model.apply(variables, f,
                                      method=FasterRCNN.roi_forward),
                out.neck_feats, props, pvalid, img_hw,
                num_classes=model.num_classes, scale_factor=scale_factors,
                score_thr=max(score_thr, 0.05), max_per_img=max_per_img,
                rescale=True)
            return Det(d["bboxes"], d["scores"], d["labels"], d["valid"])
        return step

    register_family("fast_rcnn", build=build_fast, losses=losses_fast,
                    eval_step=eval_fast, init_all=True)

    # ---- bare RPN (class-agnostic proposal network) ----
    def build_rpn(cfg):
        return RPN(depth=cfg.model.depth,
                   frozen_stages=cfg.model.frozen_stages)

    def losses_rpn(model, cfg, **_):
        rpn_cfg = RPNLossConfig()

        def losses_fn(variables, batch, teacher_vars, rng):
            out = model.apply(variables, batch.images, batch.img_hw)
            return rpn_loss(out.rpn, batch.gt_bboxes, batch.gt_valid,
                            batch.img_hw, rng, rpn_cfg), None
        return losses_fn

    def eval_rpn(model, *, score_thr, max_per_img, **_):
        from ..utils.det import Det

        @jax.jit
        def step(variables, images, img_hw, scale_factors):
            out = model.apply(variables, images, img_hw,
                              deterministic=True)
            props, scores, pvalid = rpn_proposals(
                out.rpn, img_hw, nms_pre=1000, max_total=max_per_img)
            return Det(props / scale_factors[:, None, :], scores,
                       jnp.zeros(scores.shape, jnp.int32), pvalid)
        return step

    register_family("rpn", build=build_rpn, losses=losses_rpn,
                    eval_step=eval_rpn)


_register()

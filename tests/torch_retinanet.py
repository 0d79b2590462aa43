"""Functional torch-CPU re-statement of the mmdet RetinaNet forward
(reference: mmdet/models/detectors/retinanet.py = SingleStageDetector,
necks/fpn.py:154-193 forward, dense_heads/retina_head.py:74-96
forward_single), driven straight off an mmdet-layout state dict.

Used by test_full_forward_parity.py as the torch side of the whole-model
CNN-family oracle: ResNet18 backbone (shared with torch_flagship) ->
FPN (start_level=1, add_extra_convs='on_input',
relu_before_extra_convs=False per configs/retinanet/*_r50_fpn_1x) ->
shared 4-conv-stack RetinaHead over all 5 levels.
"""
import torch
import torch.nn.functional as F

from torch_flagship import resnet18_backbone


def _conv(state, name, x, stride=1, padding=0):
    return F.conv2d(x, state[name + ".weight"], state[name + ".bias"],
                    stride=stride, padding=padding)


def retina_fpn(state, feats):
    """feats: [C3, C4, C5] -> [P3..P7] per necks/fpn.py:154-193."""
    lat = [_conv(state, f"neck.lateral_convs.{i}.conv", f)
           for i, f in enumerate(feats)]
    for i in range(len(lat) - 1, 0, -1):
        lat[i - 1] = lat[i - 1] + F.interpolate(
            lat[i], size=lat[i - 1].shape[2:], mode="nearest")
    outs = [_conv(state, f"neck.fpn_convs.{i}.conv", l, padding=1)
            for i, l in enumerate(lat)]
    # extra levels 'on_input': P6 from C5, P7 from P6 (no relu between —
    # retinanet config leaves relu_before_extra_convs at False)
    outs.append(_conv(state, "neck.fpn_convs.3.conv", feats[-1],
                      stride=2, padding=1))
    outs.append(_conv(state, "neck.fpn_convs.4.conv", outs[-1],
                      stride=2, padding=1))
    return outs


def retina_head(state, feats, stacked_convs=4):
    """retina_head.py:74-96 forward_single on every level (shared convs)."""
    cls_scores, bbox_preds = [], []
    for f in feats:
        c = r = f
        for i in range(stacked_convs):
            c = F.relu(_conv(state, f"bbox_head.cls_convs.{i}.conv", c,
                             padding=1))
            r = F.relu(_conv(state, f"bbox_head.reg_convs.{i}.conv", r,
                             padding=1))
        cls_scores.append(_conv(state, "bbox_head.retina_cls", c,
                                padding=1))
        bbox_preds.append(_conv(state, "bbox_head.retina_reg", r,
                                padding=1))
    return cls_scores, bbox_preds


def retinanet_forward(state, images):
    """images (B, 3, H, W) -> per-level ([cls (B,A*C,h,w)], [reg])."""
    with torch.no_grad():
        feats = resnet18_backbone(state, images)
        pyramid = retina_fpn(state, feats)
        return retina_head(state, pyramid)

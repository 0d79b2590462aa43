"""Functional torch-CPU re-statement of the mmdet Faster R-CNN forward
(reference: mmdet/models/detectors/two_stage.py extract_feat +
dense_heads/rpn_head.py forward_single + roi_heads/standard_roi_head.py
_bbox_forward with SingleRoIExtractor level mapping +
roi_heads/bbox_heads/convfc_bbox_head.py Shared2FCBBoxHead), driven
straight off an mmdet-layout state dict.

Used by test_full_forward_parity.py as the torch side of the TWO-STAGE
whole-model oracle: ResNet18 -> FPN (start_level=0, parameter-free
max-pool P6, fpn.py:187-189) -> shared RPN tower -> torchvision
roi_align (aligned=True, sampling_ratio=2 — the mmcv semantics pinned by
test_roi_align_oracle.py) at SingleRoIExtractor's mapped level ->
Shared2FC head.
"""
import numpy as np
import torch
import torch.nn.functional as F

# torchvision is not in the image: the RoIAlign side of the oracle is the
# looped numpy restatement of the mmcv CUDA kernel that
# test_roi_align_oracle.py pins against ops/roi_align.py
from test_roi_align_oracle import _roi_align_mmcv
from torch_flagship import resnet18_backbone


def _conv(state, name, x, stride=1, padding=0):
    return F.conv2d(x, state[name + ".weight"], state[name + ".bias"],
                    stride=stride, padding=padding)


def faster_fpn(state, feats):
    """[C2..C5] -> [P2..P6]; extra level is max_pool2d(P5, 1, stride 2)
    (necks/fpn.py:187-189, the no-add_extra_convs branch)."""
    lat = [_conv(state, f"neck.lateral_convs.{i}.conv", f)
           for i, f in enumerate(feats)]
    for i in range(len(lat) - 1, 0, -1):
        lat[i - 1] = lat[i - 1] + F.interpolate(
            lat[i], size=lat[i - 1].shape[2:], mode="nearest")
    outs = [_conv(state, f"neck.fpn_convs.{i}.conv", l, padding=1)
            for i, l in enumerate(lat)]
    outs.append(F.max_pool2d(outs[-1], 1, stride=2))
    return outs


def rpn_forward(state, pyramid):
    """rpn_head.py forward_single: shared 3x3 tower + 1x1 cls/reg."""
    cls_out, reg_out = [], []
    for f in pyramid:
        y = F.relu(_conv(state, "rpn_head.rpn_conv", f, padding=1))
        cls_out.append(_conv(state, "rpn_head.rpn_cls", y))
        reg_out.append(_conv(state, "rpn_head.rpn_reg", y))
    return cls_out, reg_out


def roi_forward(state, pyramid, rois_per_image,
                strides=(4, 8, 16, 32), finest_scale=56):
    """SingleRoIExtractor (map_roi_levels: floor(log2(sqrt(wh)/56+1e-6))
    clamped to [0, 3]) + Shared2FCBBoxHead. rois_per_image: (B, R, 4) in
    image coords. Returns (cls (B, R, C+1), reg (B, R, 4C))."""
    B, R = rois_per_image.shape[:2]
    cls_all, reg_all = [], []
    for b in range(B):
        rois = rois_per_image[b]
        w = rois[:, 2] - rois[:, 0]
        h = rois[:, 3] - rois[:, 1]
        scale = torch.sqrt((w * h).clamp(min=1e-6))
        lvl = torch.floor(torch.log2(scale / finest_scale + 1e-6))
        lvl = lvl.clamp(0, 3).long()
        feats = torch.zeros((R, pyramid[0].shape[1], 7, 7))
        for i in range(4):
            sel = (lvl == i).numpy()
            if not sel.any():
                continue
            f_hwc = pyramid[i][b].permute(1, 2, 0).numpy()
            pooled = _roi_align_mmcv(f_hwc, rois[sel].numpy(), 7,
                                     1.0 / strides[i], sampling_ratio=2)
            feats[torch.tensor(sel)] = torch.tensor(
                pooled.transpose(0, 3, 1, 2), dtype=torch.float32)
        x = feats.flatten(1)                       # (R, 256*49) NCHW-major
        x = F.relu(F.linear(x, state["roi_head.bbox_head.shared_fcs.0.weight"],
                            state["roi_head.bbox_head.shared_fcs.0.bias"]))
        x = F.relu(F.linear(x, state["roi_head.bbox_head.shared_fcs.1.weight"],
                            state["roi_head.bbox_head.shared_fcs.1.bias"]))
        cls_all.append(F.linear(x, state["roi_head.bbox_head.fc_cls.weight"],
                                state["roi_head.bbox_head.fc_cls.bias"]))
        reg_all.append(F.linear(x, state["roi_head.bbox_head.fc_reg.weight"],
                                state["roi_head.bbox_head.fc_reg.bias"]))
    return torch.stack(cls_all), torch.stack(reg_all)


def faster_rcnn_forward(state, images, rois_per_image):
    """images (B, 3, H, W), rois (B, R, 4) -> (rpn_cls, rpn_reg per
    level; roi cls/reg for the given proposals)."""
    with torch.no_grad():
        feats = resnet18_backbone(state, images, min_stage=1)  # C2..C5
        pyramid = faster_fpn(state, feats)
        rpn_cls, rpn_reg = rpn_forward(state, pyramid)
        cls, reg = roi_forward(state, pyramid, rois_per_image)
    return (rpn_cls, rpn_reg), (cls, reg)

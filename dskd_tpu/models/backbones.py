"""Backbone registry: string spec -> feature-extractor module.

Replaces the mmdet BACKBONES registry for detectors that accept a
configurable backbone (ModelConfig.backbone). Specs:
  ""/"resnet"       -> ResNet(depth) 4-stage pyramid (the family default)
  "resnext"         -> ResNet(depth, groups=32, base_width=4)
  "regnetx_3.2gf".. -> RegNet (regnet.py arch table)
  "effb0".."effb5"  -> EfficientNet stride-8/16/32 stages
  "hrnet_w18" etc.  -> HRNet multi-resolution branches (pair with HRFPN)
  "swin_tiny" etc.  -> Swin Transformer stages
"""
from __future__ import annotations

# backbones that carry stochastic depth (DropPath) and therefore take a
# `deterministic` kwarg at apply time
_STOCHASTIC = ("effb", "swin", "pvt")


def apply_backbone(bb, spec: str, images, deterministic: bool = True):
    """Apply a built backbone, threading `deterministic` only to the
    families whose __call__ takes it (stochastic-depth backbones)."""
    if spec.startswith(_STOCHASTIC):
        return bb(images, deterministic=deterministic)
    return bb(images)


def build_backbone(spec: str, depth: int = 50, frozen_stages: int = 1,
                   name: str = "backbone", drop_path_rate: float = 0.0):
    """Returns (module, pyramid_kind): pyramid_kind is 'c2345' for 4-stage
    stride-4..32 pyramids, 'c345' for stride-8..32 triples (EfficientNet),
    'hr' for HRNet branch lists (needs HRFPN)."""
    from .resnet import ResNet

    if spec in ("", "resnet"):
        return (ResNet(depth=depth, out_indices=(0, 1, 2, 3),
                       frozen_stages=frozen_stages, name=name), "c2345")
    if spec == "resnext":
        return (ResNet(depth=depth, groups=32, base_width=4,
                       out_indices=(0, 1, 2, 3),
                       frozen_stages=frozen_stages, name=name), "c2345")
    if spec.startswith("regnetx"):
        from .regnet import RegNet
        return (RegNet(arch=spec, out_indices=(0, 1, 2, 3),
                       frozen_stages=frozen_stages, name=name), "c2345")
    if spec.startswith("effb"):
        from .efficientnet import EfficientNet
        # drop_path_rate is recipe-specific (retinanet_effb3 sets 0.2) —
        # the caller passes it rather than this shared builder
        return (EfficientNet(arch=spec[3:], out_indices=(2, 4, 6),
                             frozen_stages=frozen_stages,
                             drop_path_rate=drop_path_rate, name=name),
                "c345")
    if spec.startswith("hrnet_w"):
        from .hrnet import HRNet
        return (HRNet(width=int(spec[len("hrnet_w"):]),
                      frozen_stages=frozen_stages, name=name), "hr")
    if spec.startswith("swin"):
        from .swin import SwinTransformer
        arch = spec.split("_", 1)[1] if "_" in spec else "tiny"
        # detection recipes (mask_rcnn/retinanet swin-t 1x) train with
        # stochastic depth 0.2; callers thread `deterministic`
        return (SwinTransformer(arch=arch,
                                drop_path_rate=(drop_path_rate or 0.2),
                                name=name), "c2345")
    if spec.startswith("res2net"):
        from .res2net import Res2Net
        d = int(spec[len("res2net"):]) if len(spec) > 7 else 50
        return (Res2Net(depth=d, out_indices=(0, 1, 2, 3),
                        frozen_stages=frozen_stages, name=name), "c2345")
    if spec.startswith("resnest"):
        from .resnest import ResNeSt
        d = int(spec[len("resnest"):]) if len(spec) > 7 else 50
        return (ResNeSt(depth=d, out_indices=(0, 1, 2, 3),
                        frozen_stages=frozen_stages, name=name), "c2345")
    if spec.startswith("pvt"):
        from .pvt import PVT
        arch = spec.split("_", 1)[1] if "_" in spec else "tiny"
        return (PVT(arch=arch, drop_path_rate=(drop_path_rate or 0.1),
                    name=name), "c2345")
    raise ValueError(f"unknown backbone spec: {spec!r}")

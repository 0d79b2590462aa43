"""Torchvision/mmcv ResNet checkpoint -> flax params conversion.

Parity requirement (SURVEY §7 hard part 4): the flagship recipe initializes
the backbone from torchvision resnet50 weights
(configs/deformable_detr/chaosuan_*_il.py:48). This converts a .pth state
dict (torch CPU is available in-image) into this repo's NHWC flax layout:
conv weights OIHW -> HWIO, BN running stats into 'batch_stats'.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _to_np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def convert_resnet_state_dict(state: Dict[str, Any], depth: int = 50,
                              blocks_per_stage=None):
    """torchvision resnet state_dict -> (params, batch_stats) nested dicts
    matching dskd_tpu.models.resnet.ResNet module names."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, val):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = val

    def conv(src):
        return _to_np(state[src]).transpose(2, 3, 1, 0)  # OIHW -> HWIO

    def bn(dst_tree_p, dst_tree_s, dst, src):
        put(dst_tree_p, dst + ("scale",), _to_np(state[src + ".weight"]))
        put(dst_tree_p, dst + ("bias",), _to_np(state[src + ".bias"]))
        put(dst_tree_s, dst + ("mean",), _to_np(state[src + ".running_mean"]))
        put(dst_tree_s, dst + ("var",), _to_np(state[src + ".running_var"]))

    put(params, ("stem_conv", "kernel"), conv("conv1.weight"))
    bn(params, stats, ("stem_bn",), "bn1")

    if blocks_per_stage is None:
        blocks_per_stage = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3),
                            50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
    bottleneck = any(f"layer1.0.conv3.weight" in k for k in state)
    n_convs = 3 if bottleneck else 2
    for s, n_blocks in enumerate(blocks_per_stage, start=1):
        for b in range(n_blocks):
            name = f"layer{s}_block{b}"
            src = f"layer{s}.{b}"
            for c in range(1, n_convs + 1):
                put(params, (name, f"conv{c}", "kernel"),
                    conv(f"{src}.conv{c}.weight"))
                bn(params, stats, (name, f"bn{c}"), f"{src}.bn{c}")
            if f"{src}.downsample.0.weight" in state:
                put(params, (name, "downsample_conv", "kernel"),
                    conv(f"{src}.downsample.0.weight"))
                bn(params, stats, (name, "downsample_bn"),
                   f"{src}.downsample.1")
    return params, stats


def load_resnet_weights(variables, ckpt_path: str, depth: int = 50,
                        backbone_key: str = "backbone"):
    """Load a torchvision .pth into an initialized variables dict."""
    import torch
    state = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if "state_dict" in state:
        state = state["state_dict"]
    params, stats = convert_resnet_state_dict(state, depth)

    variables = dict(variables)
    new_params = dict(variables["params"])
    new_params[backbone_key] = _merge(new_params[backbone_key], params)
    variables["params"] = new_params
    bs = dict(variables.get("batch_stats", {}))
    bs[backbone_key] = _merge(bs.get(backbone_key, {}), stats)
    variables["batch_stats"] = bs
    return variables


def _merge(dst, src):
    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            if k in out and hasattr(out[k], "shape"):
                assert tuple(out[k].shape) == tuple(v.shape), \
                    (k, out[k].shape, v.shape)
            out[k] = v
    return out

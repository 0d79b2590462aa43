#!/usr/bin/env python
"""External-checkpoint importers: detectron / pycls-RegNet / self-sup
encoders -> the torchvision-style backbone state-dict layout that
``dskd_tpu.utils.torch_weights`` (and tools/model_converters/mmdet2dskd)
consume.

Parity surface: /root/reference/tools/model_converters/
  * detectron2pytorch.py — caffe2 detectron ResNet blobs
    (``conv1_w``, ``res_conv1_bn_s/_b``, ``res{i}_{j}_branch{1,2a,2b,2c}``)
    to torch keys; detectron's AffineChannel layers become BN with
    zero running_mean / unit running_var and the affine scale/bias.
  * regnet2mmdet.py — pycls RegNet keys (``stem.conv``, ``s{i}.b{j}.
    {proj,bn,f.a/a_bn/b/b_bn/c/c_bn,f.se...}``) to mmdet RegNet keys
    (``conv1/bn1``, ``layer{i}.{j-1}.conv{k}/bn{k}/downsample.{0,1}``).
  * selfsup2mmdet.py — MoCo encoders carry the backbone under
    ``module.encoder_q.``; SwAV checkpoints already use plain keys.

Pure key surgery on numpy/torch dicts — no network needed. Output is a
``{"state_dict": {...}}`` torch file ready for utils/torch_weights or
tools/model_converters/mmdet2dskd.py.
"""
import argparse
import pickle
import sys

import numpy as np


def convert_selfsup(blobs, mode: str):
    """MoCo: keep only module.encoder_q.* (the momentum encoder and the
    projection head are dropped); SwAV needs no key changes."""
    if mode == "swav":
        return dict(blobs)
    out = {}
    for k, v in blobs.items():
        if k.startswith("module.encoder_q."):
            out[k[len("module.encoder_q."):]] = v
    return out


def convert_regnet(blobs):
    """pycls RegNet -> mmdet RegNet key layout."""
    out = {}
    for k, v in blobs.items():
        if k.startswith("stem.conv"):
            nk = k.replace("stem.conv", "conv1")
        elif k.startswith("stem.bn"):
            nk = k.replace("stem.bn", "bn1")
        elif k.startswith("head.fc"):
            nk = k.replace("head.fc", "fc")
        elif k.startswith("s"):
            parts = k.split(".")
            stage, block, module = parts[0], parts[1], parts[2]
            layer = f"layer{int(stage[1:])}"
            bidx = int(block[1:]) - 1
            if module == "proj":
                nk = f"{layer}.{bidx}.downsample.0.{parts[-1]}"
            elif module == "bn" and bidx == 0:
                nk = f"{layer}.{bidx}.downsample.1.{parts[-1]}"
            elif module == "f":
                sub = parts[3]
                name = {"a": "conv1", "a_bn": "bn1", "b": "conv2",
                        "b_bn": "bn2", "c": "conv3", "c_bn": "bn3"}.get(sub)
                if name is None:      # squeeze-excite etc: keep under f
                    nk = f"{layer}.{bidx}.{'.'.join(parts[3:])}"
                else:
                    nk = f"{layer}.{bidx}.{name}.{parts[-1]}"
            else:
                raise ValueError(f"unsupported pycls key {k}")
        else:
            raise ValueError(f"unsupported pycls key {k}")
        out[nk] = v
    return out


ARCH_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def convert_detectron(blobs, depth: int = 50):
    """caffe2 detectron ResNet blobs -> torch ResNet keys.

    Detectron replaces BN with AffineChannel (scale ``_s`` + bias
    ``_b``); the emitted BN carries those as weight/bias with frozen
    zero-mean/unit-var statistics (the reference converter does the
    same — the stats were folded into the affine terms at training
    time)."""
    if depth not in ARCH_BLOCKS:
        raise ValueError(f"depth must be one of {sorted(ARCH_BLOCKS)}")
    out = {}

    def conv(caffe, torch_name):
        out[torch_name + ".weight"] = blobs[caffe + "_w"]
        if caffe + "_b" in blobs:
            out[torch_name + ".bias"] = blobs[caffe + "_b"]

    def bn(caffe, torch_name):
        s = np.asarray(blobs[caffe + "_s"])
        out[torch_name + ".weight"] = blobs[caffe + "_s"]
        out[torch_name + ".bias"] = blobs[caffe + "_b"]
        out[torch_name + ".running_mean"] = np.zeros(s.shape, np.float32)
        out[torch_name + ".running_var"] = np.ones(s.shape, np.float32)

    conv("conv1", "conv1")
    bn("res_conv1_bn", "bn1")
    for i, n in enumerate(ARCH_BLOCKS[depth], start=1):
        for j in range(n):
            if j == 0:
                conv(f"res{i + 1}_{j}_branch1", f"layer{i}.{j}.downsample.0")
                bn(f"res{i + 1}_{j}_branch1_bn",
                   f"layer{i}.{j}.downsample.1")
            for k, letter in enumerate("abc"):
                conv(f"res{i + 1}_{j}_branch2{letter}",
                     f"layer{i}.{j}.conv{k + 1}")
                bn(f"res{i + 1}_{j}_branch2{letter}_bn",
                   f"layer{i}.{j}.bn{k + 1}")
    if "fc1000_w" in blobs:
        conv("fc1000", "fc")
    return out


def _load(path: str):
    if path.endswith((".pkl", ".pickle")):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        return data.get("blobs", data)
    import torch
    data = torch.load(path, map_location="cpu")
    return data.get("state_dict", data)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--kind", required=True,
                   choices=["detectron", "regnet", "moco", "swav"])
    p.add_argument("--depth", type=int, default=50,
                   help="detectron ResNet depth (50/101)")
    args = p.parse_args(argv)

    blobs = _load(args.src)
    if args.kind == "detectron":
        out = convert_detectron(blobs, depth=args.depth)
    elif args.kind == "regnet":
        out = convert_regnet(blobs)
    else:
        out = convert_selfsup(blobs, args.kind)
    import torch
    torch.save({"state_dict": {
        k: (torch.as_tensor(np.asarray(v))) for k, v in out.items()}},
        args.dst)
    print(f"{args.kind}: wrote {len(out)} tensors -> {args.dst}")


if __name__ == "__main__":
    sys.exit(main())

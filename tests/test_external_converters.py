"""External-checkpoint importers (tools/model_converters/external2dskd.py)
vs the reference key grammars (tools/model_converters/{detectron2pytorch,
regnet2mmdet,selfsup2mmdet}.py) on synthetic dicts."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools",
                                "model_converters"))

from external2dskd import (convert_detectron, convert_regnet,
                           convert_selfsup)


def test_moco_strips_encoder_q_and_drops_momentum_encoder():
    blobs = {
        "module.encoder_q.conv1.weight": np.ones((64, 3, 7, 7)),
        "module.encoder_q.layer1.0.conv1.weight": np.ones((64, 64, 1, 1)),
        "module.encoder_k.conv1.weight": np.zeros((64, 3, 7, 7)),
        "module.queue": np.zeros((128, 65536)),
    }
    out = convert_selfsup(blobs, "moco")
    assert set(out) == {"conv1.weight", "layer1.0.conv1.weight"}


def test_swav_passthrough():
    blobs = {"conv1.weight": np.ones((64, 3, 7, 7))}
    assert convert_selfsup(blobs, "swav") == blobs


def test_regnet_key_grammar():
    blobs = {
        "stem.conv.weight": 1, "stem.bn.weight": 2, "stem.bn.bias": 3,
        "s1.b1.proj.weight": 4, "s1.b1.bn.weight": 5,
        "s1.b1.f.a.weight": 6, "s1.b1.f.a_bn.weight": 7,
        "s1.b1.f.b.weight": 8, "s1.b1.f.b_bn.running_mean": 9,
        "s1.b1.f.c.weight": 10, "s1.b1.f.c_bn.bias": 11,
        "s1.b2.f.a.weight": 12,
        "s2.b1.proj.weight": 13,
        "head.fc.weight": 14,
    }
    out = convert_regnet(blobs)
    assert out["conv1.weight"] == 1
    assert out["bn1.weight"] == 2
    assert out["layer1.0.downsample.0.weight"] == 4
    assert out["layer1.0.downsample.1.weight"] == 5
    assert out["layer1.0.conv1.weight"] == 6
    assert out["layer1.0.bn1.weight"] == 7
    assert out["layer1.0.bn2.running_mean"] == 9
    assert out["layer1.0.bn3.bias"] == 11
    assert out["layer1.1.conv1.weight"] == 12
    assert out["layer2.0.downsample.0.weight"] == 13
    assert out["fc.weight"] == 14


def _synthetic_detectron_blobs(depth=50):
    blobs = {"conv1_w": np.random.randn(64, 3, 7, 7).astype(np.float32),
             "res_conv1_bn_s": np.ones(64, np.float32),
             "res_conv1_bn_b": np.zeros(64, np.float32)}
    from external2dskd import ARCH_BLOCKS
    chans = [(64, 256), (256, 512), (512, 1024), (1024, 2048)]
    for i, n in enumerate(ARCH_BLOCKS[depth], start=1):
        cin, cout = chans[i - 1]
        mid = cout // 4
        for j in range(n):
            if j == 0:
                blobs[f"res{i + 1}_{j}_branch1_w"] = np.zeros(
                    (cout, cin, 1, 1), np.float32)
                blobs[f"res{i + 1}_{j}_branch1_bn_s"] = np.ones(
                    cout, np.float32)
                blobs[f"res{i + 1}_{j}_branch1_bn_b"] = np.zeros(
                    cout, np.float32)
            for letter, c in zip("abc", (mid, mid, cout)):
                blobs[f"res{i + 1}_{j}_branch2{letter}_w"] = np.zeros(
                    (c, 1, 1, 1), np.float32)
                blobs[f"res{i + 1}_{j}_branch2{letter}_bn_s"] = np.ones(
                    c, np.float32)
                blobs[f"res{i + 1}_{j}_branch2{letter}_bn_b"] = np.zeros(
                    c, np.float32)
    return blobs


def test_detectron_resnet50_complete_torch_layout():
    out = convert_detectron(_synthetic_detectron_blobs(), depth=50)
    # every torchvision resnet50 backbone conv/bn key present
    assert "conv1.weight" in out and "bn1.running_var" in out
    for i, n in zip(range(1, 5), (3, 4, 6, 3)):
        assert f"layer{i}.0.downsample.0.weight" in out
        assert f"layer{i}.0.downsample.1.running_mean" in out
        for j in range(n):
            for k in (1, 2, 3):
                assert f"layer{i}.{j}.conv{k}.weight" in out
                assert f"layer{i}.{j}.bn{k}.weight" in out
    # AffineChannel -> BN: identity statistics, affine terms preserved
    assert np.all(out["bn1.running_mean"] == 0)
    assert np.all(out["bn1.running_var"] == 1)
    assert np.all(out["bn1.weight"] == 1)

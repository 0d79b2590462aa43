"""NAS-FCOS searched FPN + the NASFCOS family (parity: mmdet
necks/nasfcos_fpn.py + detectors/nasfcos.py + configs/nas_fcos, AP 39.4).

The searched DAG, transcribed from the reference's cell list: 1x1
adapt convs (BN+ReLU) produce f0..f2 (C3..C5); seven ConcatCells append
f3..f9, each cell = per-input 3x3 conv+GN, resize to the larger input,
channel concat, and a grouped 1x1 out conv in (norm, act, conv) order;
outputs P3..P5 = bilinear(f{9,8,7} + resize(f5)) back to input sizes,
plus two stride-2 extra downsamples ((act, norm, conv) order).
The head is the standard FCOS head (the reference's searched head's
deformable tower is a documented simplification here).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _resize_bilinear(x, hw):
    if x.shape[1:3] == tuple(hw):
        return x
    return jax.image.resize(x, (x.shape[0],) + tuple(hw) + (x.shape[-1],),
                            method="bilinear")


class ConcatCell(nn.Module):
    features: int
    with_input1_conv: bool = True
    with_input2_conv: bool = True

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True):
        def in_conv(x, name, enabled):
            if not enabled:
                return x
            y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, name=f"{name}_conv")(x)
            return nn.GroupNorm(epsilon=1e-5, num_groups=32,
                                name=f"{name}_gn")(y)

        x1 = in_conv(x1, "in1", self.with_input1_conv)
        x2 = in_conv(x2, "in2", self.with_input2_conv)
        hw = (max(x1.shape[1], x2.shape[1]),
              max(x1.shape[2], x2.shape[2]))
        y = jnp.concatenate([_resize_bilinear(x1, hw),
                             _resize_bilinear(x2, hw)], -1)
        # out conv order (norm, act, conv); grouped 1x1 mixes each channel
        # with its concat partner
        y = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, name="out_bn")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (1, 1), feature_group_count=self.features,
                    use_bias=False, name="out_conv")(y)
        return y


# cell name -> (input idx 1, input idx 2); appended as f3..f9 in order
CELLS = (("c22_1", 2, 2), ("c22_2", 2, 2), ("c32", 3, 2), ("c02", 0, 2),
         ("c42", 4, 2), ("c36", 3, 6), ("c61", 6, 1))


class NASFCOSFPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        C = self.out_channels
        feats = []
        for i, x in enumerate(inputs):
            y = nn.Conv(C, (1, 1), use_bias=False,
                        name=f"adapt{i}")(x)
            y = nn.relu(nn.BatchNorm(
                use_running_average=deterministic, momentum=0.9,
                epsilon=1e-5, name=f"adapt_bn{i}")(y))
            feats.append(y)

        for name, i1, i2 in CELLS:
            feats.append(ConcatCell(C, name=name)(
                feats[i1], feats[i2], deterministic))

        ret = []
        for idx, in_idx in zip((9, 8, 7), (0, 1, 2)):
            f1 = feats[idx]
            f2 = _resize_bilinear(feats[5], f1.shape[1:3])
            ret.append(_resize_bilinear(f1 + f2,
                                        inputs[in_idx].shape[1:3]))
        x = ret[-1]
        for j in range(self.num_outs - 3):
            if j > 0:
                x = nn.relu(x)
            x = nn.Conv(C, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)],
                        name=f"extra_down{j}")(x)
            ret.append(x)
        return tuple(ret)

"""NAS-FPN neck (parity: mmdet/models/necks/nas_fpn.py + mmcv
merge_cells.py — the searched 7-cell merging DAG, stacked stack_times).

Cells: SumCell (resize both inputs to the target size, add) and
GlobalPoolingCell (x2 + sigmoid(GAP(x2)) * x1) — each optionally followed
by an out conv in the searched ('act', 'conv', 'norm') order. Resizing:
nearest upsample when smaller, max-pool when larger. The DAG per stage
(reference nas_fpn.py:88-125 comments):
    p4_1 = gp(p6, p4); p4_2 = sum(p4_1, p4); p3' = sum(p4_2, p3)
    p4' = sum(p3', p4_2); p5' = sum(p5, gp(p4', p3'))
    p7' = sum(p7, gp(p5', p4_2)); p6' = gp(p7', p5')
BatchNorm trains (the reference's norm_cfg BN requires_grad) — running
stats live in 'batch_stats', updated when deterministic=False.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _resize_to(x, hw):
    h, w = hw
    if x.shape[1] == h and x.shape[2] == w:
        return x
    if x.shape[1] < h:        # nearest upsample
        f = h // x.shape[1]
        B, H, W, C = x.shape
        y = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (B, H, f, W, f, C))
        return y.reshape(B, H * f, W * f, C)
    k = x.shape[1] // h       # max-pool downsample
    return nn.max_pool(x, (k, k), strides=(k, k))


class _MergeCell(nn.Module):
    features: int
    kind: str = "sum"         # 'sum' | 'gp'
    with_out_conv: bool = True

    @nn.compact
    def __call__(self, x1, x2, out_hw, deterministic: bool = True):
        x1 = _resize_to(x1, out_hw)
        x2 = _resize_to(x2, out_hw)
        if self.kind == "sum":
            y = x1 + x2
        else:                 # global pooling: x2's GAP attention gates x1
            att = jax.nn.sigmoid(x2.mean((1, 2), keepdims=True))
            y = x2 + att * x1
        if self.with_out_conv:
            y = nn.relu(y)    # searched order: act -> conv -> norm
            y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, name="out_conv")(y)
            y = nn.BatchNorm(use_running_average=deterministic,
                             momentum=0.9, epsilon=1e-5, name="out_bn")(y)
        return y


class NASFPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 7

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        C = self.out_channels
        feats = []
        for i, x in enumerate(inputs):
            y = nn.Conv(C, (1, 1), use_bias=False,
                        name=f"lateral{i}")(x)
            y = nn.BatchNorm(use_running_average=deterministic,
                             momentum=0.9, epsilon=1e-5,
                             name=f"lateral_bn{i}")(y)
            feats.append(y)
        for j in range(self.num_outs - len(inputs)):
            y = nn.Conv(C, (1, 1), use_bias=False,
                        name=f"extra{j}")(feats[-1])
            y = nn.BatchNorm(use_running_average=deterministic,
                             momentum=0.9, epsilon=1e-5,
                             name=f"extra_bn{j}")(y)
            feats.append(nn.max_pool(y, (2, 2), strides=(2, 2)))

        p3, p4, p5, p6, p7 = feats
        hw = lambda t: (t.shape[1], t.shape[2])
        for s in range(self.stack_times):
            cell = lambda kind, name, woc=True: _MergeCell(
                C, kind, with_out_conv=woc, name=f"s{s}_{name}")
            p4_1 = cell("gp", "gp_64_4")(p6, p4, hw(p4), deterministic)
            p4_2 = cell("sum", "sum_44_4")(p4_1, p4, hw(p4), deterministic)
            p3 = cell("sum", "sum_43_3")(p4_2, p3, hw(p3), deterministic)
            p4 = cell("sum", "sum_34_4")(p3, p4_2, hw(p4), deterministic)
            p5_t = cell("gp", "gp_43_5", False)(p4, p3, hw(p5),
                                                deterministic)
            p5 = cell("sum", "sum_55_5")(p5, p5_t, hw(p5), deterministic)
            p7_t = cell("gp", "gp_54_7", False)(p5, p4_2, hw(p7),
                                                deterministic)
            p7 = cell("sum", "sum_77_7")(p7, p7_t, hw(p7), deterministic)
            p6 = cell("gp", "gp_75_6")(p7, p5, hw(p6), deterministic)
        return (p3, p4, p5, p6, p7)

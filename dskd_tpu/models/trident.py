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

from typing import Sequence, Tuple

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
    def __call__(self, xs):
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

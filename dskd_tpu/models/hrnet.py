"""HRNet backbone + HRFPN neck (parity: mmdet/models/backbones/hrnet.py:589,
mmdet/models/necks/hrfpn.py).

HRNetV2p: a stride-4 stem, one bottleneck stage, then parallel
multi-resolution branches that exchange information through fuse layers
after every module — high-resolution representations are maintained
end-to-end instead of recovered by upsampling. Branch widths double per
resolution step ([w, 2w, 4w, 8w]).

Fuse semantics (hrnet.py HRModule._make_fuse_layers): lower->higher
resolution uses 1x1 conv + BN + NEAREST upsample; higher->lower chains
3x3/2 convs (intermediate hops keep the source width + ReLU, the last hop
projects to the target width, no ReLU); the fused sum is ReLU'd.

HRFPN: bilinear-upsample every branch to the stride-4 map, concat, 1x1
reduction, then num_outs AvgPool(2^i)+3x3 outputs.

TPU notes: all exchanges are static-shape conv/resize ops (no gathers);
nearest upsample is a reshape-broadcast. BN runs frozen (norm_eval).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import BasicBlock, Bottleneck, FrozenBatchNorm

# (num_modules per stage 2/3/4) — the standard HRNetV2p layout
STAGE_MODULES = (1, 4, 3)
BLOCKS_PER_BRANCH = 4


def _nearest_up(x, factor: int):
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (B, H, factor, W, factor, C))
    return x.reshape(B, H * factor, W * factor, C)


class HRModule(nn.Module):
    """num_branches parallel BasicBlock chains + full pairwise fusion."""
    channels: Tuple[int, ...]

    @nn.compact
    def __call__(self, xs):
        n = len(self.channels)
        ys = []
        for i, x in enumerate(xs):
            y = x
            for b in range(BLOCKS_PER_BRANCH):
                y = BasicBlock(self.channels[i],
                               name=f"branch{i}_block{b}")(y)
            ys.append(y)

        outs = []
        for i in range(n):
            acc = None
            for j in range(n):
                if j == i:
                    t = ys[j]
                elif j > i:
                    # lower res -> up: 1x1 conv + BN + nearest upsample
                    t = nn.Conv(self.channels[i], (1, 1), use_bias=False,
                                name=f"fuse{i}_{j}_conv")(ys[j])
                    t = FrozenBatchNorm(name=f"fuse{i}_{j}_bn")(t)
                    t = _nearest_up(t, 2 ** (j - i))
                else:
                    # higher res -> down: chain of 3x3/2 convs
                    t = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        t = nn.Conv(ch, (3, 3), strides=(2, 2),
                                    padding=[(1, 1), (1, 1)],
                                    use_bias=False,
                                    name=f"fuse{i}_{j}_conv{k}")(t)
                        t = FrozenBatchNorm(name=f"fuse{i}_{j}_bn{k}")(t)
                        if not last:
                            t = nn.relu(t)
                acc = t if acc is None else acc + t
            outs.append(nn.relu(acc))
        return outs


class HRNet(nn.Module):
    width: int = 18         # W18 -> branch channels (18, 36, 72, 144)
    frozen_stages: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        w = self.width
        chans = (w, 2 * w, 4 * w, 8 * w)

        y = nn.Conv(64, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="stem_conv1")(x)
        y = nn.relu(FrozenBatchNorm(name="stem_bn1")(y))
        y = nn.Conv(64, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="stem_conv2")(y)
        y = nn.relu(FrozenBatchNorm(name="stem_bn2")(y))
        if self.frozen_stages >= 0:
            y = jax.lax.stop_gradient(y)

        # stage 1: 4 bottlenecks at stride 4 (64 -> 256)
        for b in range(4):
            y = Bottleneck(64, downsample=(b == 0),
                           name=f"layer1_block{b}")(y)
        if self.frozen_stages >= 1:
            y = jax.lax.stop_gradient(y)

        # transitions grow one branch per stage; stage s uses chans[:s+1]
        branches = [y]
        for si, n_modules in enumerate(STAGE_MODULES, start=2):
            cur = chans[:si]
            new_branches = []
            for i, c in enumerate(cur):
                if i < len(branches):
                    src = branches[i]
                    if src.shape[-1] != c:
                        # width-align conv (transition1's per-branch conv)
                        src = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                                      use_bias=False,
                                      name=f"transition{si - 1}_b{i}")(src)
                        src = nn.relu(FrozenBatchNorm(
                            name=f"transition{si - 1}_b{i}_bn")(src))
                    new_branches.append(src)
                else:
                    # new (lower-res) branch: 3x3/2 from the previous last
                    src = nn.Conv(c, (3, 3), strides=(2, 2),
                                  padding=[(1, 1), (1, 1)], use_bias=False,
                                  name=f"transition{si - 1}_b{i}")(
                        branches[-1])
                    src = nn.relu(FrozenBatchNorm(
                        name=f"transition{si - 1}_b{i}_bn")(src))
                    new_branches.append(src)
            branches = new_branches
            for m in range(n_modules):
                branches = HRModule(cur, name=f"stage{si}_module{m}")(
                    branches)
        return tuple(branches)


class HRFPN(nn.Module):
    """Concat-upsampled branches -> 1x1 reduction -> pooled 3x3 outputs."""
    out_channels: int = 256
    num_outs: int = 5

    @nn.compact
    def __call__(self, inputs) -> Tuple[jnp.ndarray, ...]:
        B, H, W, _ = inputs[0].shape
        ups = [inputs[0]]
        for f in inputs[1:]:
            ups.append(jax.image.resize(f, (B, H, W, f.shape[-1]),
                                        method="bilinear"))
        y = jnp.concatenate(ups, axis=-1)
        y = nn.Conv(self.out_channels, (1, 1), name="reduction_conv")(y)
        outs = []
        for i in range(self.num_outs):
            t = y if i == 0 else nn.avg_pool(
                y, (2 ** i, 2 ** i), strides=(2 ** i, 2 ** i))
            t = nn.Conv(self.out_channels, (3, 3),
                        padding=[(1, 1), (1, 1)],
                        name=f"fpn_conv{i}")(t)
            outs.append(t)
        return tuple(outs)

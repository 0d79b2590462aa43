"""CSPDarknet backbone (parity: mmdet/models/backbones/csp_darknet.py).

The YOLOX backbone: a Focus stem (space-to-depth + conv), four
conv-stride-2 + CSPLayer stages, SPP bottleneck (5/9/13 max-pool pyramid)
in the last stage. Reuses the PAFPN's ConvBNSwish/CSPLayer bricks
(swish + trainable BN). deepen/widen factors select the P5/P6 variants.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from .yoloy_pafpn import ConvBNSwish, CSPLayer

# (out_channels, num_blocks, add_identity, use_spp) per stage (P5 arch)
ARCH = ((128, 3, True, False), (256, 9, True, False),
        (512, 9, True, False), (1024, 3, False, True))


class Focus(nn.Module):
    """Space-to-depth stem (csp_darknet.py Focus): 2x2 pixel shuffle into
    channels then a 3x3 conv — a stride-2 stem without information loss."""
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        patches = jnp.concatenate([
            x[:, 0::2, 0::2], x[:, 1::2, 0::2],
            x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        return ConvBNSwish(self.out_channels, 3, name="conv")(patches,
                                                              train)


class SPPBottleneck(nn.Module):
    """Spatial pyramid pooling (5/9/13 max-pool kernels, stride 1)."""
    out_channels: int
    kernel_sizes: Sequence[int] = (5, 9, 13)

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = x.shape[-1] // 2
        y = ConvBNSwish(mid, 1, name="conv1")(x, train)
        pools = [y] + [
            nn.max_pool(y, (k, k), strides=(1, 1),
                        padding=((k // 2, k // 2), (k // 2, k // 2)))
            for k in self.kernel_sizes]
        y = jnp.concatenate(pools, axis=-1)
        return ConvBNSwish(self.out_channels, 1, name="conv2")(y, train)


class CSPDarknet(nn.Module):
    """out_indices are stage ids 1..4 (mmdet default (2, 3, 4) feeds the
    YOLOX PAFPN with strides 8/16/32)."""
    deepen_factor: float = 1.0
    widen_factor: float = 1.0
    out_indices: Sequence[int] = (2, 3, 4)
    frozen_stages: int = -1

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, ...]:
        stem_c = int(64 * self.widen_factor)
        out = Focus(stem_c, name="stem")(x, train)
        if self.frozen_stages >= 0:
            out = lax.stop_gradient(out)

        outs = []
        for i, (ch, n, ident, spp) in enumerate(ARCH):
            ch = int(ch * self.widen_factor)
            n = max(round(n * self.deepen_factor), 1)
            out = ConvBNSwish(ch, 3, stride=2,
                              name=f"stage{i + 1}_down")(out, train)
            if spp:
                out = SPPBottleneck(ch, name=f"stage{i + 1}_spp")(out,
                                                                  train)
            out = CSPLayer(ch, num_blocks=n, add_identity=ident,
                           name=f"stage{i + 1}_csp")(out, train)
            if self.frozen_stages >= i + 1:
                out = lax.stop_gradient(out)
            if i + 1 in self.out_indices:
                outs.append(out)
        return tuple(outs)

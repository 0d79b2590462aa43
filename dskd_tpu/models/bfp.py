"""Balanced Feature Pyramid (parity: mmdet/models/necks/bfp.py, Libra
R-CNN): resize every level to the refine level, average into one
"balanced" map, refine with a 3x3 conv, and add the resized residual back
onto each input level. Identity-preserving strengthening on top of any
FPN output.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def _resize_to(x, h, w):
    B, H, W, C = x.shape
    if H == h and W == w:
        return x
    if H > h:        # downscale by integer max-pool (gather-free)
        kh, kw = H // h, W // w
        return nn.max_pool(x, (kh, kw), strides=(kh, kw))
    r = h // H
    return jnp.repeat(jnp.repeat(x, r, axis=1), r, axis=2)


class BFP(nn.Module):
    refine_level: int = 2

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]
                 ) -> Tuple[jnp.ndarray, ...]:
        h, w = inputs[self.refine_level].shape[1:3]
        gathered = [_resize_to(x, h, w) for x in inputs]
        balanced = sum(gathered) / len(gathered)
        C = balanced.shape[-1]
        # init parity (necks/bfp.py init_cfg): Xavier-uniform conv
        refined = nn.Conv(C, (3, 3), padding=[(1, 1), (1, 1)],
                          kernel_init=nn.initializers.xavier_uniform(),
                          name="refine")(balanced)
        outs = []
        for x in inputs:
            res = _resize_to(refined, x.shape[1], x.shape[2])
            outs.append(x + res)
        return tuple(outs)

"""Balanced Feature Pyramid (parity: mmdet/models/necks/bfp.py, Libra
R-CNN): resize every level to the refine level, average into one
"balanced" map, refine with a 3x3 conv, and add the resized residual back
onto each input level. Identity-preserving strengthening on top of any
FPN output.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
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


class NonLocal2d(nn.Module):
    """mmcv NonLocal2d, embedded-gaussian mode, reduction=1,
    use_scale=False — the Libra BFP refine op (necks/bfp.py:62-68).
    conv_out is ZERO-initialized (mmcv _NonLocalNd.init_weights with no
    norm) so the block starts as identity; theta/phi/g Normal(0.01)."""
    use_scale: bool = False

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        n01 = nn.initializers.normal(0.01)
        g = nn.Conv(C, (1, 1), kernel_init=n01,
                    name="g")(x).reshape(B, H * W, C)
        theta = nn.Conv(C, (1, 1), kernel_init=n01,
                        name="theta")(x).reshape(B, H * W, C)
        phi = nn.Conv(C, (1, 1), kernel_init=n01,
                      name="phi")(x).reshape(B, H * W, C)
        pw = jnp.einsum("bic,bjc->bij", theta, phi)
        if self.use_scale:
            pw = pw / jnp.sqrt(jnp.asarray(C, pw.dtype))
        pw = jax.nn.softmax(pw, axis=-1)
        y = jnp.einsum("bij,bjc->bic", pw, g).reshape(B, H, W, C)
        return x + nn.Conv(C, (1, 1),
                           kernel_init=nn.initializers.zeros,
                           name="conv_out")(y)


class BFP(nn.Module):
    refine_level: int = 2
    # Libra's config sets refine_type='non_local'
    # (configs/libra_rcnn/libra_faster_rcnn_r50_fpn_1x_coco.py:15)
    refine_type: str = "non_local"

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]
                 ) -> Tuple[jnp.ndarray, ...]:
        h, w = inputs[self.refine_level].shape[1:3]
        gathered = [_resize_to(x, h, w) for x in inputs]
        balanced = sum(gathered) / len(gathered)
        C = balanced.shape[-1]
        if self.refine_type == "non_local":
            refined = NonLocal2d(name="refine")(balanced)
        elif self.refine_type == "conv":
            # init parity (necks/bfp.py init_cfg): Xavier-uniform conv
            refined = nn.Conv(C, (3, 3), padding=[(1, 1), (1, 1)],
                              kernel_init=nn.initializers.xavier_uniform(),
                              name="refine")(balanced)
        else:
            refined = balanced
        outs = []
        for x in inputs:
            res = _resize_to(refined, x.shape[1], x.shape[2])
            outs.append(x + res)
        return tuple(outs)

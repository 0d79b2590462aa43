"""Backbone/neck plugins (parity: mmdet/models/plugins/dropblock.py 85).

DropBlock regularization: instead of dropping independent activations,
drop contiguous ``block_size`` x ``block_size`` spatial blocks — the
structured-dropout scheme convnets need because nearby activations are
spatially correlated (Ghiasi et al. 2018; reference defaults
drop_prob=0.1, block_size=3, warmup iters ignored here — schedule the
prob from the caller if desired).

The reference's other plugins (pixel_decoder.py,
msdeformattn_pixel_decoder.py) are MaskFormer-family-only and stay out
of scope with the maskformer heads.

TPU note: the block expansion is a max-pool over the Bernoulli seed
noise — one reduce_window, no gathers; everything static-shape."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class DropBlock(nn.Module):
    """dropblock.py DropBlock2D: gamma-corrected Bernoulli seeds,
    max-pool expansion to blocks, feature renormalization."""
    drop_prob: float = 0.1
    block_size: int = 3

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.drop_prob <= 0.0:
            return x
        B, H, W, C = x.shape
        bs = min(self.block_size, H, W)
        # seed probability so the expected dropped fraction ~= drop_prob
        # (dropblock.py gamma): p * HW / bs^2 / valid-seed-area
        gamma = (self.drop_prob / (bs ** 2) * (H * W)
                 / max((H - bs + 1) * (W - bs + 1), 1))
        rng = self.make_rng("dropout")
        seeds = jax.random.bernoulli(
            rng, gamma, (B, H - bs + 1, W - bs + 1, C)).astype(x.dtype)
        pad = [(0, 0), (bs // 2, bs - 1 - bs // 2),
               (bs // 2, bs - 1 - bs // 2), (0, 0)]
        seeds = jnp.pad(seeds, pad)
        # expand each seed to a block via max-pool
        block = jax.lax.reduce_window(
            seeds, 0.0, jax.lax.max, (1, bs, bs, 1), (1, 1, 1, 1),
            "SAME")
        mask = 1.0 - block
        keep = jnp.maximum(mask.mean(), 1e-6)
        return x * mask / keep

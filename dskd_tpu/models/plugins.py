"""Backbone/neck plugins (parity: mmdet/models/plugins/dropblock.py 85).

DropBlock regularization: instead of dropping independent activations,
drop contiguous ``block_size`` x ``block_size`` spatial blocks — the
structured-dropout scheme convnets need because nearby activations are
spatially correlated (Ghiasi et al. 2018; reference defaults
drop_prob=0.1, block_size=3, warmup iters ignored here — schedule the
prob from the caller if desired).

The reference's MaskFormer-family plugins live with their heads:
pixel_decoder.py -> models/maskformer.py TransformerEncoderPixelDecoder,
msdeformattn_pixel_decoder.py -> models/mask2former.py
MSDeformAttnPixelDecoder. The mmcv backbone plugin ContextBlock
(configs/gcnet) is below; GeneralizedAttention (configs/
empirical_attention) is superseded by the deformable-attention families
and not rebuilt.

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


class ContextBlock(nn.Module):
    """GCNet global-context block (configs/gcnet/*_r4_gcb_c3-c5;
    mmcv plugin contract re-derived from the GCNet paper, Cao et al.
    ICCVW'19): attention-pooled global context (1x1 conv -> softmax over
    HW -> weighted sum of the input) transformed by a bottleneck
    1x1 -> LayerNorm -> ReLU -> 1x1 and fused channel-wise.

    The fusion convs are ZERO-initialized (mmcv last_zero_init) so a
    freshly-inserted block is an identity function — pretrained backbone
    behavior is preserved at step 0.
    """
    ratio: float = 0.25
    pooling_type: str = "att"                 # 'att' | 'avg'
    fusion_types: tuple = ("channel_add",)    # +'channel_mul'

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        planes = max(1, int(C * self.ratio))
        if self.pooling_type == "att":
            attn = nn.Conv(1, (1, 1), name="conv_mask")(x)
            attn = jax.nn.softmax(attn.reshape(B, H * W), axis=1)
            ctx = jnp.einsum("bnc,bn->bc", x.reshape(B, H * W, C), attn)
        else:
            ctx = x.mean(axis=(1, 2))
        ctx = ctx[:, None, None, :]
        out = x
        for f in self.fusion_types:
            t = nn.Conv(planes, (1, 1), name=f"{f}_fc1")(ctx)
            t = nn.LayerNorm(name=f"{f}_ln")(t)
            t = nn.relu(t)
            t = nn.Conv(C, (1, 1),
                        kernel_init=nn.initializers.zeros,
                        name=f"{f}_fc2")(t)
            if f == "channel_mul":
                out = out * jax.nn.sigmoid(t)
            else:
                out = out + t
        return out

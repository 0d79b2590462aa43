"""Pyramid Vision Transformer v1 backbone (parity:
mmdet/models/backbones/pvt.py:591, PVT-tiny/small layouts).

Four stages of (patch embed -> transformer blocks with Spatial-Reduction
Attention -> learned position embedding). SRA computes K/V on a
sr_ratio-strided convolutional reduction of the token map, making global
attention affordable at stride 4. Position embeddings are learned per
stage at the canonical 224-input token counts and bilinearly resized to
the actual map (the reference's interpolate-on-mismatch).

All reshapes static; attention is plain batched MXU matmuls.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ARCHS = {
    "tiny": dict(dims=(64, 128, 320, 512), depths=(2, 2, 2, 2),
                 heads=(1, 2, 5, 8), sr=(8, 4, 2, 1),
                 mlp=(8, 8, 4, 4)),
    "small": dict(dims=(64, 128, 320, 512), depths=(3, 4, 6, 3),
                  heads=(1, 2, 5, 8), sr=(8, 4, 2, 1),
                  mlp=(8, 8, 4, 4)),
}


class SRAttention(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x, h, w):
        """x: (B, N, C) tokens of an (h, w) map."""
        B, N, C = x.shape
        hd = C // self.num_heads
        q = nn.Dense(C, name="q")(x).reshape(B, N, self.num_heads, hd)
        kv_in = x
        if self.sr_ratio > 1:
            m = x.reshape(B, h, w, C)
            m = nn.Conv(C, (self.sr_ratio, self.sr_ratio),
                        strides=(self.sr_ratio, self.sr_ratio),
                        name="sr")(m)
            kv_in = nn.LayerNorm(epsilon=1e-5, name="sr_norm")(
                m.reshape(B, -1, C))
        kv = nn.Dense(2 * C, name="kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        M = k.shape[1]
        k = k.reshape(B, M, self.num_heads, hd)
        v = v.reshape(B, M, self.num_heads, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (hd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        return nn.Dense(C, name="proj")(out)


class PVTBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: int

    @nn.compact
    def __call__(self, x, h, w):
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + SRAttention(self.dim, self.num_heads, self.sr_ratio,
                            name="attn")(y, h, w)
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + y


class PVT(nn.Module):
    arch: str = "tiny"
    out_indices: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        cfg = ARCHS[self.arch]
        B = x.shape[0]
        outs = []
        for si in range(4):
            dim = cfg["dims"][si]
            patch = 4 if si == 0 else 2
            x = nn.Conv(dim, (patch, patch), strides=(patch, patch),
                        name=f"patch_embed{si}")(x)
            Bh, h, w, _ = x.shape
            tokens = x.reshape(B, h * w, dim)
            tokens = nn.LayerNorm(epsilon=1e-5,
                                  name=f"embed_norm{si}")(tokens)
            # learned pos embed at the canonical 224-input grid, resized
            base = 224 // (4 * 2 ** si)
            pe = self.param(f"pos_embed{si}",
                            nn.initializers.truncated_normal(0.02),
                            (base * base, dim))
            pe2 = jax.image.resize(pe.reshape(base, base, dim),
                                   (h, w, dim), method="bilinear")
            tokens = tokens + pe2.reshape(1, h * w, dim)
            for b in range(cfg["depths"][si]):
                tokens = PVTBlock(dim, cfg["heads"][si], cfg["sr"][si],
                                  cfg["mlp"][si],
                                  name=f"stage{si}_block{b}")(tokens, h, w)
            tokens = nn.LayerNorm(epsilon=1e-5,
                                  name=f"out_norm{si}")(tokens)
            x = tokens.reshape(B, h, w, dim)
            if si in self.out_indices:
                outs.append(x)
        return tuple(outs)

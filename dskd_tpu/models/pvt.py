"""Pyramid Vision Transformer v1 backbone (parity:
mmdet/models/backbones/pvt.py:591, PVT-tiny/small layouts).

Four stages of (patch embed -> transformer blocks with Spatial-Reduction
Attention -> learned position embedding). SRA computes K/V on a
sr_ratio-strided convolutional reduction of the token map, making global
attention affordable at stride 4. Position embeddings are learned per
stage at the canonical 224-input token counts and bilinearly resized to
the actual map (the reference's interpolate-on-mismatch).

v1 details matched to the reference (pvt.py:405-581):
* LayerNorm eps 1e-6 (norm_cfg LN eps=1e-6, pvt.py:431);
* patch embeds use padding 0 (paddings=[0,0,0,0], pvt.py:419);
* NO per-stage output norm — norm_after_stage=False for v1, so layer[2]
  is nn.Identity (pvt.py:519-522; the norm belongs to PVTv2);
* stochastic depth: drop_path_rate 0.1 decayed linearly over the summed
  block depth (pvt.py:426,474-478);
* from-scratch init: trunc_normal(0.02) Linear, fan-out normal convs
  (pvt.py:524-540).

All reshapes static; attention is plain batched MXU matmuls.
"""
from __future__ import annotations

import math
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

_DENSE_INIT = nn.initializers.truncated_normal(0.02)


def _fan_out_init(k: int, out_ch: int):
    """Reference conv init: normal(0, sqrt(2 / (k*k*out_ch))) (pvt.py:533)."""
    return nn.initializers.normal(math.sqrt(2.0 / (k * k * out_ch)))


class SRAttention(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x, h, w):
        """x: (B, N, C) tokens of an (h, w) map."""
        B, N, C = x.shape
        hd = C // self.num_heads
        q = nn.Dense(C, kernel_init=_DENSE_INIT,
                     name="q")(x).reshape(B, N, self.num_heads, hd)
        kv_in = x
        if self.sr_ratio > 1:
            m = x.reshape(B, h, w, C)
            m = nn.Conv(C, (self.sr_ratio, self.sr_ratio),
                        strides=(self.sr_ratio, self.sr_ratio),
                        kernel_init=_fan_out_init(self.sr_ratio, C),
                        name="sr")(m)
            kv_in = nn.LayerNorm(epsilon=1e-6, name="sr_norm")(
                m.reshape(B, -1, C))
        kv = nn.Dense(2 * C, kernel_init=_DENSE_INIT, name="kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        M = k.shape[1]
        k = k.reshape(B, M, self.num_heads, hd)
        v = v.reshape(B, M, self.num_heads, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (hd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        return nn.Dense(C, kernel_init=_DENSE_INIT, name="proj")(out)


class PVTBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: int
    drop_path: float = 0.0

    def _drop_path(self, y, deterministic):
        # mmcv DropPath: drop the whole residual branch per sample
        if self.drop_path == 0.0:
            return y
        return nn.Dropout(rate=self.drop_path, broadcast_dims=(1, 2))(
            y, deterministic=deterministic)

    @nn.compact
    def __call__(self, x, h, w, deterministic: bool = True):
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        y = SRAttention(self.dim, self.num_heads, self.sr_ratio,
                        name="attn")(y, h, w)
        x = x + self._drop_path(y, deterministic)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, kernel_init=_DENSE_INIT,
                     name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, kernel_init=_DENSE_INIT, name="fc2")(y)
        return x + self._drop_path(y, deterministic)


class PVT(nn.Module):
    arch: str = "tiny"
    out_indices: Sequence[int] = (0, 1, 2, 3)
    # reference pvt.py:426 default; linear decay over all blocks
    drop_path_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, ...]:
        cfg = ARCHS[self.arch]
        B = x.shape[0]
        total = sum(cfg["depths"])
        bi = 0
        outs = []
        for si in range(4):
            dim = cfg["dims"][si]
            patch = 4 if si == 0 else 2
            x = nn.Conv(dim, (patch, patch), strides=(patch, patch),
                        padding="VALID",
                        kernel_init=_fan_out_init(patch, dim),
                        name=f"patch_embed{si}")(x)
            Bh, h, w, _ = x.shape
            tokens = x.reshape(B, h * w, dim)
            tokens = nn.LayerNorm(epsilon=1e-6,
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
                dpr = self.drop_path_rate * bi / max(total - 1, 1)
                tokens = PVTBlock(dim, cfg["heads"][si], cfg["sr"][si],
                                  cfg["mlp"][si], drop_path=dpr,
                                  name=f"stage{si}_block{b}")(
                    tokens, h, w, deterministic=deterministic)
                bi += 1
            # v1: no out norm (norm_after_stage=False -> Identity)
            x = tokens.reshape(B, h, w, dim)
            if si in self.out_indices:
                outs.append(x)
        return tuple(outs)

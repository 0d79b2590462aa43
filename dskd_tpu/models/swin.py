"""Swin Transformer backbone (parity: mmdet/models/backbones/swin.py,
Swin-T/S/B layouts).

Patch embed (4x4 conv + LN), four stages of windowed attention blocks
(W-MSA alternating with shifted SW-MSA, 7x7 windows, learned relative
position bias, boundary masking for the shifted halves), 4C->2C patch
merging between stages, per-stage output LayerNorms. Window partition /
shift masks are computed at trace time from the static feature size —
everything under jit is fixed-shape einops-style reshapes + batched
matmuls (MXU-friendly; no gathers).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

WINDOW = 7

ARCHS = {
    "tiny": dict(embed_dim=96, depths=(2, 2, 6, 2), heads=(3, 6, 12, 24)),
    "small": dict(embed_dim=96, depths=(2, 2, 18, 2), heads=(3, 6, 12, 24)),
    "base": dict(embed_dim=128, depths=(2, 2, 18, 2),
                 heads=(4, 8, 16, 32)),
}


def _rel_pos_index(w: int) -> np.ndarray:
    """(w*w, w*w) index into the (2w-1)^2 relative bias table."""
    coords = np.stack(np.mgrid[:w, :w]).reshape(2, -1)      # (2, w*w)
    rel = coords[:, :, None] - coords[:, None, :]           # (2, n, n)
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _shift_mask(hp: int, wp: int, shift: int) -> np.ndarray:
    """(num_windows, w*w, w*w) additive mask for SW-MSA (swin.py's
    img_mask construction), computed statically."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -WINDOW), slice(-WINDOW, -shift),
               slice(-shift, None)):
        for ws in (slice(0, -WINDOW), slice(-WINDOW, -shift),
                   slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(hp // WINDOW, WINDOW, wp // WINDOW, WINDOW)
    win = win.transpose(0, 2, 1, 3).reshape(-1, WINDOW * WINDOW)
    mask = win[:, :, None] != win[:, None, :]
    return np.where(mask, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (nW*B, w*w, C); mask: (nW, w*w, w*w) additive or None."""
        Bn, N, C = x.shape
        H = self.num_heads
        hd = C // H
        qkv = nn.Dense(3 * C, name="qkv")(x).reshape(Bn, N, 3, H, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = (q @ k.transpose(0, 1, 3, 2)) * (hd ** -0.5)  # (Bn,H,N,N)

        table = self.param("rel_bias",
                           nn.initializers.truncated_normal(0.02),
                           ((2 * WINDOW - 1) ** 2, H))
        idx = _rel_pos_index(WINDOW).reshape(-1)
        bias = table[idx].reshape(N, N, H).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, H, N, N) \
                + mask[None, :, None]
            attn = attn.reshape(Bn, H, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(Bn, N, C)
        return nn.Dense(C, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    shift: int            # 0 = W-MSA, WINDOW//2 = SW-MSA
    drop_path: float = 0.0

    def _drop_path(self, y, deterministic):
        # DropPath (stochastic depth): drop the whole residual branch per
        # sample, rescaled by 1/keep_prob — mmcv DropPath on both the attn
        # and FFN adds (reference swin.py:344,353)
        if self.drop_path == 0.0:
            return y
        return nn.Dropout(rate=self.drop_path, broadcast_dims=(1, 2, 3))(
            y, deterministic=deterministic)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, H, W, C); H/W need not be WINDOW multiples — the map is
        zero-padded bottom/right to the window grid and cropped back, the
        reference swin.py's F.pad in its window partition."""
        B, H, W, C = x.shape
        # reference swin.py: shift is a no-op when the map is not larger
        # than the window (e.g. the 7x7 stage-4 map at 224 input) —
        # shift_size is forced to 0 there, so match it
        shift = self.shift if min(H, W) > WINDOW else 0
        Hp = -(-H // WINDOW) * WINDOW
        Wp = -(-W // WINDOW) * WINDOW
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        if (Hp, Wp) != (H, W):
            y = jnp.pad(y, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask(Hp, Wp, shift))
        else:
            mask = None
        # window partition
        y = y.reshape(B, Hp // WINDOW, WINDOW, Wp // WINDOW, WINDOW, C)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
            -1, WINDOW * WINDOW, C)
        y = WindowAttention(self.dim, self.num_heads, name="attn")(y, mask)
        y = y.reshape(B, Hp // WINDOW, Wp // WINDOW, WINDOW, WINDOW, C)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = shortcut + self._drop_path(y[:, :H, :W], deterministic)

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(4 * C, name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(C, name="mlp_fc2")(y)
        return x + self._drop_path(y, deterministic)


class PatchMerging(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        if H % 2 or W % 2:     # pad to even (reference PatchMerging F.pad)
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
            B, H, W, C = x.shape
        # channel layout matches mmdet swin.py's nn.Unfold(kernel=2,
        # stride=2): merged channel c*4 + (i*2 + j) for input channel c and
        # kernel position (i, j) — reduction/norm weights of converted
        # mmdet checkpoints apply without permutation
        y = jnp.stack([x[:, 0::2, 0::2], x[:, 0::2, 1::2],
                       x[:, 1::2, 0::2], x[:, 1::2, 1::2]], -1)
        y = y.reshape(B, H // 2, W // 2, 4 * C)
        y = nn.LayerNorm(epsilon=1e-5, name="norm")(y)
        return nn.Dense(self.out_dim, use_bias=False,
                        name="reduction")(y)


class SwinTransformer(nn.Module):
    """out_indices per stage (strides 4/8/16/32). Input H, W must make
    every stage's feature map a multiple of WINDOW after /4 downsampling
    (e.g. multiples of 224: 224 -> 56/28/14/7)."""
    arch: str = "tiny"
    out_indices: Sequence[int] = (0, 1, 2, 3)
    # stochastic depth, linearly decayed 0 -> rate over all blocks
    # (reference swin.py:540 default 0.1; the detection recipes —
    # mask_rcnn_swin-t-p4-w7_fpn_1x_coco.py:21 — train with 0.2)
    drop_path_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, ...]:
        cfg = ARCHS[self.arch]
        dim = cfg["embed_dim"]
        x = nn.Conv(dim, (4, 4), strides=(4, 4), name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)

        total = sum(cfg["depths"])
        bi = 0
        outs = []
        for si, (depth, heads) in enumerate(zip(cfg["depths"],
                                                cfg["heads"])):
            stage_dim = dim * 2 ** si
            if si > 0:
                x = PatchMerging(stage_dim, name=f"merge{si}")(x)
            for b in range(depth):
                dpr = self.drop_path_rate * bi / max(total - 1, 1)
                x = SwinBlock(stage_dim, heads,
                              shift=0 if b % 2 == 0 else WINDOW // 2,
                              drop_path=dpr,
                              name=f"stage{si}_block{b}")(
                    x, deterministic=deterministic)
                bi += 1
            if si in self.out_indices:
                outs.append(nn.LayerNorm(epsilon=1e-5, name=f"out_norm{si}")(x))
        return tuple(outs)

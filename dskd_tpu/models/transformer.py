"""Deformable-DETR transformer (flax.linen, static shapes).

Parity targets (behavior studied from the reference, rebuilt TPU-first):
  * mmdet/models/utils/transformer.py:713-1055 (DeformableDetrTransformer:
    level flatten + level_embeds, valid ratios from padding masks, grid
    reference points, 6-layer MSDeformAttn encoder, 300-query decoder,
    fork-added return of (memory, spatial_shapes));
  * mmcv MultiScaleDeformableAttention (value proj, offset/weight linears
    with the rotational-grid bias init, softmax over levels*points,
    grid_sample-equivalent bilinear sampling via dskd_tpu.ops.msda).

Static-shape discipline: spatial shapes are Python ints fixed at trace time
(one resolution bucket per compiled step); padding is carried as boolean
masks. All tensors are batch-first (B, S, C) — no (S, B, C) permutes.
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.msda import (ms_deform_attn_core, ms_deform_attn_core_premap,
                        pack_corners_raw)
from .positional import sine_positional_encoding


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, 0, 1)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)


def _msda_offset_bias_init(num_heads, num_levels, num_points):
    """The mmcv rotational grid init for sampling_offsets bias."""
    thetas = jnp.arange(num_heads, dtype=jnp.float32) * (
        2.0 * math.pi / num_heads)
    grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)   # (H, 2)
    grid = grid / jnp.abs(grid).max(-1, keepdims=True)
    grid = jnp.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
    scale = jnp.arange(1, num_points + 1, dtype=jnp.float32)
    grid = grid * scale[None, None, :, None]
    return grid.reshape(-1)


class _ProjParams(nn.Module):
    """Kernel/bias params with nn.Dense's exact names and shapes.

    Lets the premap path own ``value_proj`` weights without applying them to
    the full (B, S, C) memory — the param tree (and therefore checkpoints +
    the mmdet converter mapping) is identical to the nn.Dense layout.
    """
    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.xavier_uniform(),
                       (in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class MSDeformAttention(nn.Module):
    """Multi-scale deformable attention over flattened level tokens.

    ``raster_queries``: the encoder's self-attention, where query q IS
    flattened token q — unlocks the windowed level-0 gather (ops/msda.py).

    Premap mode (decoder cross-attention): pass ``packed_tables`` (raw
    corner tables from ops.msda.pack_corners_raw, built ONCE per model) and
    ``valid_wh`` instead of ``value``/``key_padding_mask``. Sampling runs in
    raw C-space and value_proj is applied post-reduction via linearity:
    proj(sum w_i x_i) = (sum w_i x_i) @ W + b * sum w_i. Bit-compatible
    params, ~6x less table-packing work per step (PERF.md round 3).
    """
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    dropout: float = 0.1
    raster_queries: bool = False

    @nn.compact
    def __call__(self, query, value, query_pos, reference_points,
                 spatial_shapes: Sequence[Tuple[int, int]],
                 key_padding_mask=None, deterministic: bool = True,
                 packed_tables=None, valid_wh=None):
        """query: (B, Q, C); value: (B, S, C); reference_points: (B, Q, L, 2)
        normalized; key_padding_mask: (B, S) True at padding."""
        B, Q, C = query.shape
        H, L, P = self.num_heads, self.num_levels, self.num_points
        identity = query
        if query_pos is not None:
            query = query + query_pos

        if packed_tables is None:
            v = nn.Dense(self.embed_dims,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name="value_proj")(value)
            if key_padding_mask is not None:
                v = jnp.where(key_padding_mask[..., None], 0.0, v)
            v = v.reshape(B, -1, H, C // H)

        offsets = nn.Dense(H * L * P * 2,
                           kernel_init=nn.initializers.zeros,
                           bias_init=lambda key, shape, dtype=jnp.float32:
                           _msda_offset_bias_init(H, L, P).astype(dtype),
                           name="sampling_offsets")(query)
        offsets = offsets.reshape(B, Q, H, L, P, 2)
        weights = nn.Dense(H * L * P, kernel_init=nn.initializers.zeros,
                           name="attention_weights")(query)
        weights = jax.nn.softmax(weights.reshape(B, Q, H, L * P), axis=-1)
        weights = weights.reshape(B, Q, H, L, P)

        # normalized sampling locations; offset normalizer is (w, h) per
        # level for 2-dim refs; 4-dim (cx, cy, w, h) refs (box refine /
        # two-stage) scale offsets by the box size (mmcv :343-356)
        if reference_points.shape[-1] == 4:
            ref = reference_points[:, :, None, :, None, :]
            locs = (ref[..., :2]
                    + offsets / self.num_points * ref[..., 2:] * 0.5)
        else:
            norm = jnp.array([[w, h] for (h, w) in spatial_shapes],
                             dtype=query.dtype)                 # (L, 2)
            locs = (reference_points[:, :, None, :, None, :]
                    + offsets / norm[None, None, None, :, None, :])

        if packed_tables is not None:
            D = C // H
            acc, wsum = ms_deform_attn_core_premap(
                packed_tables, spatial_shapes, locs, weights, valid_wh)
            k, b = _ProjParams(self.embed_dims, name="value_proj")(C)
            out = (jnp.einsum("bqhc,chd->bqhd", acc, k.reshape(C, H, D))
                   + b.reshape(H, D) * wsum[..., None])
            out = out.reshape(B, Q, C)
        else:
            out = ms_deform_attn_core(v, spatial_shapes, locs, weights,
                                      raster_queries=self.raster_queries)
        out = nn.Dense(self.embed_dims,
                       kernel_init=nn.initializers.xavier_uniform(),
                       name="output_proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return identity + out


class MultiheadAttention(nn.Module):
    """Standard MHA with DETR-style query/key pos handling (batch-first)."""
    embed_dims: int = 256
    num_heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, key, value, query_pos=None, key_pos=None,
                 deterministic: bool = True, key_padding_mask=None):
        """``key_padding_mask``: (B, K) bool, True = PADDED key (the torch
        nn.MultiheadAttention convention the reference uses) — those keys
        are excluded from every query's attention."""
        identity = query
        q = query + query_pos if query_pos is not None else query
        k = key + key_pos if key_pos is not None else key
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.embed_dims,
            out_features=self.embed_dims, dropout_rate=self.dropout,
            kernel_init=nn.initializers.xavier_uniform(),
            deterministic=deterministic, name="attn")
        mask = None
        if key_padding_mask is not None:
            # flax mask: True = attend; broadcast (B, 1, 1, K)
            mask = (~key_padding_mask)[:, None, None, :]
        out = attn(q, k, value, mask=mask)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return identity + out


class FFN(nn.Module):
    embed_dims: int = 256
    feedforward_channels: int = 1024
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        identity = x
        y = nn.Dense(self.feedforward_channels,
                     kernel_init=nn.initializers.xavier_uniform(),
                     name="fc1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.embed_dims,
                     kernel_init=nn.initializers.xavier_uniform(),
                     name="fc2")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return identity + y


class EncoderLayer(nn.Module):
    """('self_attn', 'norm', 'ffn', 'norm') with MSDeformAttention."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    feedforward_channels: int = 1024
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, pos, reference_points, spatial_shapes,
                 key_padding_mask, deterministic: bool = True):
        x = MSDeformAttention(self.embed_dims, self.num_heads,
                              self.num_levels, self.num_points, self.dropout,
                              raster_queries=True, name="self_attn")(
            x, x, pos, reference_points, spatial_shapes,
            key_padding_mask=key_padding_mask, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = FFN(self.embed_dims, self.feedforward_channels, self.dropout,
                name="ffn")(x, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x)


class DecoderLayer(nn.Module):
    """('self_attn','norm','cross_attn','norm','ffn','norm')."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    feedforward_channels: int = 1024
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, query_pos, memory, reference_points,
                 spatial_shapes, key_padding_mask, deterministic=True,
                 packed_tables=None, valid_wh=None):
        query = MultiheadAttention(self.embed_dims, self.num_heads,
                                   self.dropout, name="self_attn")(
            query, query, query, query_pos=query_pos, key_pos=query_pos,
            deterministic=deterministic)
        query = nn.LayerNorm(epsilon=1e-5, name="norm1")(query)
        query = MSDeformAttention(self.embed_dims, self.num_heads,
                                  self.num_levels, self.num_points,
                                  self.dropout, name="cross_attn")(
            query, memory, query_pos, reference_points, spatial_shapes,
            key_padding_mask=key_padding_mask, deterministic=deterministic,
            packed_tables=packed_tables, valid_wh=valid_wh)
        query = nn.LayerNorm(epsilon=1e-5, name="norm2")(query)
        query = FFN(self.embed_dims, self.feedforward_channels, self.dropout,
                    name="ffn")(query, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(query)


def encoder_reference_points(spatial_shapes, valid_ratios, dtype=jnp.float32):
    """(B, S, L, 2) normalized grid reference points (reference :833-860)."""
    refs = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ry = (jnp.arange(h, dtype=dtype) + 0.5)
        rx = (jnp.arange(w, dtype=dtype) + 0.5)
        ry = ry[:, None].repeat(w, 1).reshape(-1)    # (h*w,)
        rx = rx[None, :].repeat(h, 0).reshape(-1)
        ry = ry[None] / (valid_ratios[:, None, lvl, 1] * h)
        rx = rx[None] / (valid_ratios[:, None, lvl, 0] * w)
        refs.append(jnp.stack([rx, ry], -1))         # (B, h*w, 2)
    ref = jnp.concatenate(refs, 1)                   # (B, S, 2)
    return ref[:, :, None, :] * valid_ratios[:, None, :, :]


def level_masks_and_ratios(img_hw, batch_input_shape, spatial_shapes):
    """Per-level padding masks + valid ratios from per-image (h, w).

    Mirrors the reference's F.interpolate(nearest) downsampling of the
    full-res padding mask (gfl_deformable_detr_head_il.py:224-237): output
    pixel i of an (Hl, Wl) level samples input pixel floor(i * H / Hl).

    Returns: list of (B, h, w) bool masks (True = pad), (B, L, 2) ratios.
    """
    H, W = batch_input_shape
    masks, ratios = [], []
    for (h, w) in spatial_shapes:
        ys = (jnp.arange(h) * H // h)[None, :, None]       # (1, h, 1)
        xs = (jnp.arange(w) * W // w)[None, None, :]       # (1, 1, w)
        pad = (ys >= img_hw[:, 0, None, None]) | (
            xs >= img_hw[:, 1, None, None])                # (B, h, w)
        masks.append(pad)
        valid_h = (~pad[:, :, 0]).sum(1).astype(jnp.float32)
        valid_w = (~pad[:, 0, :]).sum(1).astype(jnp.float32)
        ratios.append(jnp.stack([valid_w / w, valid_h / h], -1))
    return masks, jnp.stack(ratios, 1)


class DeformableDetrTransformer(nn.Module):
    """Encoder + decoder over flattened multi-level features (batch-first).

    ``remat=True`` rematerializes each encoder/decoder layer on the backward
    pass (jax.checkpoint) — the HBM-for-FLOPs trade that keeps the ~8.5k
    token encoder trainable on 16GB chips.
    """
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    feedforward_channels: int = 1024
    dropout: float = 0.1
    num_query: int = 300
    remat: bool = True
    # decoder cross-attention samples pre-packed RAW memory tables built
    # once per model instead of re-packing per layer (ops/msda.py premap).
    # MEASURED SLOWER on chip at flagship shapes (3.344 vs 3.485 img/s):
    # the 4C-wide raw-space gathers move ~4x the bytes the per-layer
    # packing saves (PERF.md round 3). Kept opt-in: DSKD_PREMAP=1.
    premap_decoder: bool = False

    @nn.compact
    def __call__(self, mlvl_feats, img_hw, batch_input_shape, query_embed,
                 deterministic: bool = True):
        """mlvl_feats: tuple of (B, h, w, C) NHWC features.
        img_hw: (B, 2) valid (h, w). query_embed: (num_query, 2C).

        Returns (hs, init_reference, inter_references, memory, masks):
          hs: (num_dec_layers, B, Q, C); init/inter refs: (B, Q, 2) each
          layer; memory: (B, S, C); mask_flat: (B, S) True at pad.
        """
        B = mlvl_feats[0].shape[0]
        C = self.embed_dims
        spatial_shapes = tuple(
            (f.shape[1], f.shape[2]) for f in mlvl_feats)
        masks, valid_ratios = level_masks_and_ratios(
            img_hw, batch_input_shape, spatial_shapes)
        # exact f32 valid (w, h) token counts per level for the premap
        # padding gate (before the bf16 cast below loses integer exactness)
        level_wh = jnp.array([[w, h] for (h, w) in spatial_shapes],
                             jnp.float32)
        valid_wh = valid_ratios * level_wh[None]
        valid_ratios = valid_ratios.astype(mlvl_feats[0].dtype)

        level_embeds = self.param(
            "level_embeds", nn.initializers.normal(1.0),
            (self.num_levels, C))

        dtype = mlvl_feats[0].dtype
        feat_flat, mask_flat, pos_flat = [], [], []
        for lvl, (feat, mask) in enumerate(zip(mlvl_feats, masks)):
            pos = sine_positional_encoding(mask, num_feats=C // 2,
                                           dtype=dtype)
            h, w = spatial_shapes[lvl]
            feat_flat.append(feat.reshape(B, h * w, C))
            mask_flat.append(mask.reshape(B, h * w))
            pos_flat.append(pos.reshape(B, h * w, C)
                            + level_embeds[lvl].astype(dtype))
        feat_flat = jnp.concatenate(feat_flat, 1)      # (B, S, C)
        mask_flat = jnp.concatenate(mask_flat, 1)      # (B, S)
        pos_flat = jnp.concatenate(pos_flat, 1)

        # encoder
        enc_layer_cls = (nn.remat(EncoderLayer, static_argnums=(4, 6))
                         if self.remat else EncoderLayer)
        enc_refs = encoder_reference_points(spatial_shapes, valid_ratios,
                                            feat_flat.dtype)
        x = feat_flat
        for i in range(self.num_encoder_layers):
            x = enc_layer_cls(C, self.num_heads, self.num_levels,
                              self.num_points, self.feedforward_channels,
                              self.dropout, name=f"encoder_layer{i}")(
                x, pos_flat, enc_refs, spatial_shapes, mask_flat,
                deterministic)
        memory = x

        # decoder queries
        query_pos, query = jnp.split(query_embed, 2, axis=1)
        query_pos = jnp.broadcast_to(query_pos[None], (B,) + query_pos.shape)
        query = jnp.broadcast_to(query[None], (B,) + query.shape)
        ref_linear = nn.Dense(
            2, kernel_init=nn.initializers.variance_scaling(
                1.0, "fan_avg", "uniform"),
            name="reference_points")
        reference_points = jax.nn.sigmoid(ref_linear(query_pos))  # (B, Q, 2)
        init_reference = reference_points

        dec_layer_cls = (nn.remat(DecoderLayer, static_argnums=(5, 7))
                         if self.remat else DecoderLayer)
        import os
        env = os.environ.get("DSKD_PREMAP")
        use_premap = (self.premap_decoder if env is None else env == "1")
        if use_premap:
            # pack the raw memory ONCE; every decoder layer (and the box
            # refine variants) samples these shared tables
            packed_tables = pack_corners_raw(memory, spatial_shapes)
            dec_memory, dec_mask = None, None
        else:
            packed_tables, valid_wh = None, None
            dec_memory, dec_mask = memory, mask_flat
        inter_states, inter_refs = [], []
        for i in range(self.num_decoder_layers):
            ref_input = (reference_points[:, :, None, :]
                         * valid_ratios[:, None, :, :])        # (B, Q, L, 2)
            query = dec_layer_cls(C, self.num_heads, self.num_levels,
                                  self.num_points, self.feedforward_channels,
                                  self.dropout, name=f"decoder_layer{i}")(
                query, query_pos, dec_memory, ref_input, spatial_shapes,
                dec_mask, deterministic, packed_tables, valid_wh)
            inter_states.append(query)
            inter_refs.append(reference_points)  # no box refine: constant

        hs = jnp.stack(inter_states, 0)          # (nl, B, Q, C)
        inter_references = jnp.stack(inter_refs, 0)
        return hs, init_reference, inter_references, memory, mask_flat

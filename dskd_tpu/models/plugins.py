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
MSDeformAttnPixelDecoder. The mmcv backbone plugins ContextBlock
(configs/gcnet) and GeneralizedAttention (configs/empirical_attention,
configs/groie post-module) are below.

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


class GeneralizedAttention(nn.Module):
    """The empirical-attention spatial block (configs/empirical_attention
    faster_rcnn_r50_fpn_attention_{0010,1111}[_dcn]_1x, box AP 40.0-42.1;
    configs/groie post_cfg). Re-derived from the paper it implements —
    "An Empirical Study of Spatial Attention Mechanisms in Deep
    Networks", Zhu et al. 2019 — since the mmcv source is not vendored
    in the reference; structure (attention_type bit-switches, factorized
    per-axis sinusoidal relative-position features, kv_stride key/value
    subsampling, residual projection) matches the mmcv plugin contract.

    The four energy terms, switched by ``attention_type`` bits:
      [0] query content & key content        (Wq xq)' (Wk xk)
      [1] query content & relative position  (Wq xq)' (Wg r)
      [2] key content only (saliency)        u' (Wk xk)
      [3] relative position only             v' (Wg r)
    '0010' (the cheap config) keeps only saliency; '1111' keeps all.
    The output projection is zero-initialized so a freshly inserted
    block is an identity (the ContextBlock last_zero_init convention).
    """
    num_heads: int = 8
    attention_type: str = "1111"
    kv_stride: int = 2
    position_magnitude: int = 1
    spatial_range: int = -1          # -1 = global (the only mode used)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        bits = [c == "1" for c in self.attention_type]
        nh = self.num_heads
        dk = max(C // nh, 1)
        kv = x[:, ::self.kv_stride, ::self.kv_stride]
        Hk, Wk = kv.shape[1], kv.shape[2]
        scale = 1.0 / jnp.sqrt(jnp.asarray(dk, x.dtype))

        def heads(t, hw):
            return t.reshape(B, hw, nh, dk).transpose(0, 2, 1, 3)

        energy = jnp.zeros((B, nh, H * W, Hk * Wk), x.dtype)

        q_content = None
        if bits[0] or bits[1]:
            q_content = heads(
                nn.Conv(nh * dk, (1, 1), use_bias=False,
                        name="query_conv")(x).reshape(B, H * W, nh * dk),
                H * W)
        if bits[0] or bits[2]:
            k_content = heads(
                nn.Conv(nh * dk, (1, 1), use_bias=False,
                        name="key_conv")(kv).reshape(B, Hk * Wk, nh * dk),
                Hk * Wk)
            # accumulate the query side into a full (B, nh, q, d) array so
            # bias-only bit patterns ('0010') broadcast correctly
            q_total = jnp.zeros((B, nh, H * W, dk), x.dtype)
            if bits[0]:
                q_total = q_total + q_content
            if bits[2]:
                u = self.param("appr_bias",
                               nn.initializers.normal(1.0 / dk ** 0.5),
                               (nh, dk))
                q_total = q_total + u[None, :, None, :]
            energy = energy + jnp.einsum(
                "bhqd,bhkd->bhqk", q_total * scale, k_content)

        if bits[1] or bits[3]:
            # factorized per-axis sinusoidal relative-position features
            # (position_embedding_dim -> per-head linear), x and y terms
            # added separately then broadcast over the other axis
            feat_dim = max(C // 2, 8)

            def pos_feat(nq, nk, name):
                qi = jnp.arange(nq, dtype=jnp.float32)[:, None]
                ki = jnp.arange(nk, dtype=jnp.float32)[None, :] \
                    * self.kv_stride
                rel = (qi - ki) / self.position_magnitude     # (nq, nk)
                freq = jnp.exp(jnp.arange(feat_dim // 2, dtype=jnp.float32)
                               * (-jnp.log(10000.0) / (feat_dim // 2)))
                ang = rel[..., None] * freq                   # (nq, nk, f/2)
                emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], -1)
                out = nn.Dense(nh * dk, use_bias=False, name=name)(
                    emb.astype(x.dtype))
                return out.reshape(nq, nk, nh, dk)

            gx = pos_feat(W, Wk, "geom_fc_x")    # (W, Wk, nh, dk)
            gy = pos_feat(H, Hk, "geom_fc_y")
            q_geom = jnp.zeros((B, nh, H * W, dk), x.dtype)
            if bits[1]:
                q_geom = q_geom + q_content
            if bits[3]:
                v = self.param("geom_bias",
                               nn.initializers.normal(1.0 / dk ** 0.5),
                               (nh, dk))
                q_geom = q_geom + v[None, :, None, :]
            qg = (q_geom * scale).reshape(B, nh, H, W, dk)
            # x-axis term: query (b, h, y, x, d) x pos (x, kx, h, d)
            ex = jnp.einsum("bhyxd,xkhd->bhyxk", qg, gx)   # (B,nh,H,W,Wk)
            ey = jnp.einsum("bhyxd,ykhd->bhyxk",
                            qg, gy)                        # (B,nh,H,W,Hk)
            e_pos = (ey[:, :, :, :, :, None] + ex[:, :, :, :, None, :])
            energy = energy + e_pos.reshape(B, nh, H * W, Hk * Wk)

        attn = jax.nn.softmax(energy, axis=-1)
        v_feat = heads(
            nn.Conv(nh * dk, (1, 1), use_bias=False,
                    name="value_conv")(kv).reshape(B, Hk * Wk, nh * dk),
            Hk * Wk)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v_feat)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, nh * dk)
        out = nn.Conv(C, (1, 1), kernel_init=nn.initializers.zeros,
                      name="proj_conv")(out)
        return x + out

"""Premap decoder cross-attention == per-layer packed path (bit-level plan).

The decoder optimization (PERF.md round 3) packs the RAW encoder memory once
per model and applies each layer's value_proj AFTER the weighted corner
reduction (linearity). These tests pin the algebra:
  * core-level: premap sampling + post-projection == project-then-sample
    with rectangular key-padding masks;
  * model-level: DeformableDetrTransformer(premap_decoder=True) output ==
    premap_decoder=False with the SAME params (the param trees are
    identical by construction — _ProjParams mirrors nn.Dense names).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dskd_tpu.models.transformer import DeformableDetrTransformer
from dskd_tpu.ops.msda import (ms_deform_attn_core,
                               ms_deform_attn_core_premap, pack_corners_raw)


def _rect_mask(img_hw, batch_input_shape, spatial_shapes):
    """Per-level flattened rectangular pad masks + valid (w, h) counts."""
    H, W = batch_input_shape
    flats, valid_wh = [], []
    for (h, w) in spatial_shapes:
        ys = (np.arange(h) * H // h)[None, :, None]
        xs = (np.arange(w) * W // w)[None, None, :]
        pad = (ys >= img_hw[:, 0, None, None]) | (
            xs >= img_hw[:, 1, None, None])
        flats.append(pad.reshape(pad.shape[0], -1))
        valid_wh.append(np.stack([(~pad[:, 0, :]).sum(1),
                                  (~pad[:, :, 0]).sum(1)], -1))
    return (np.concatenate(flats, 1),
            np.stack(valid_wh, 1).astype(np.float32))


def test_core_premap_matches_projected_path():
    rng = np.random.RandomState(0)
    B, H, D, P = 2, 4, 8, 3
    spatial_shapes = ((6, 8), (3, 4))
    S = sum(h * w for h, w in spatial_shapes)
    C = H * D
    Q = 17

    memory = rng.randn(B, S, C).astype(np.float32)
    W_proj = rng.randn(C, C).astype(np.float32) * 0.1
    b_proj = rng.randn(C).astype(np.float32) * 0.1
    locs = rng.rand(B, Q, H, len(spatial_shapes), P, 2).astype(np.float32)
    locs = locs * 1.3 - 0.15          # include out-of-bounds samples
    weights = rng.rand(B, Q, H, len(spatial_shapes), P).astype(np.float32)
    weights /= weights.sum((-1, -2), keepdims=True)
    img_hw = np.array([[40, 60], [48, 64]], np.int32)   # input 48x64
    mask_flat, valid_wh = _rect_mask(img_hw, (48, 64), spatial_shapes)

    # reference path: project, zero padded tokens, head-split, sample
    v = memory @ W_proj + b_proj
    v = np.where(mask_flat[..., None], 0.0, v).reshape(B, S, H, D)
    ref = ms_deform_attn_core(jnp.asarray(v), spatial_shapes,
                              jnp.asarray(locs), jnp.asarray(weights),
                              mxu_gather_max_rows=0)

    # premap path: sample raw, project the reduction
    tables = pack_corners_raw(jnp.asarray(memory), spatial_shapes)
    acc, wsum = ms_deform_attn_core_premap(
        tables, spatial_shapes, jnp.asarray(locs), jnp.asarray(weights),
        jnp.asarray(valid_wh))
    out = (jnp.einsum("bqhc,chd->bqhd", acc,
                      jnp.asarray(W_proj).reshape(C, H, D))
           + jnp.asarray(b_proj).reshape(H, D) * wsum[..., None])
    out = out.reshape(B, Q, C)

    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("remat", [False, True])
def test_transformer_premap_matches_replay(remat):
    """Same params, premap on/off -> same transformer outputs."""
    rng = np.random.RandomState(1)
    B, C = 2, 32
    kw = dict(embed_dims=C, num_heads=4, num_levels=2, num_points=2,
              num_encoder_layers=1, num_decoder_layers=2,
              feedforward_channels=64, num_query=9, remat=remat)
    tf_ref = DeformableDetrTransformer(premap_decoder=False, **kw)
    tf_new = DeformableDetrTransformer(premap_decoder=True, **kw)

    feats = (jnp.asarray(rng.randn(B, 8, 8, C).astype(np.float32)),
             jnp.asarray(rng.randn(B, 4, 4, C).astype(np.float32)))
    img_hw = jnp.asarray(np.array([[64, 50], [40, 64]], np.int32))
    qe = jnp.asarray(rng.randn(9, 2 * C).astype(np.float32))

    params = tf_ref.init(jax.random.PRNGKey(0), feats, img_hw, (64, 64), qe)
    params2 = tf_new.init(jax.random.PRNGKey(0), feats, img_hw, (64, 64), qe)
    # identical param trees (shapes + names) by construction
    chex_tree = jax.tree.map(lambda a, b: a.shape == b.shape,
                             params, params2)
    assert all(jax.tree.leaves(chex_tree))

    o_ref = tf_ref.apply(params, feats, img_hw, (64, 64), qe)
    o_new = tf_new.apply(params, feats, img_hw, (64, 64), qe)
    for a, b, name in zip(o_ref, o_new,
                          ("hs", "init_ref", "inter_refs", "memory",
                           "mask")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)

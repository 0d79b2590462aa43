"""Fused single-gather multi-level RoIAlign == the per-level masked sum.

The fused path (ops/roi_align.py _fused_multi_level) gathers each ROI
only at its assigned FPN level from a concatenated table; the reference
formulation pools every ROI at every level and masks. Same arithmetic,
so the comparison is to float tolerance ~0 (per-ROI gathered scale vs
scalar scale can reassociate the coordinate multiplies).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dskd_tpu.ops.roi_align import multi_level_roi_align, roi_align


def _masked_sum_reference(feats, rois, roi_valid, strides, out_size=7,
                          finest_scale=56, level_rois=None):
    lr = rois if level_rois is None else level_rois
    w = lr[:, 2] - lr[:, 0]
    h = lr[:, 3] - lr[:, 1]
    scale = jnp.sqrt(jnp.clip(w * h, 1e-6, None))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, len(feats) - 1).astype(jnp.int32)
    out = 0.0
    for i, f in enumerate(feats):
        o = roi_align(f, rois, out_size, spatial_scale=1.0 / strides[i])
        out = out + jnp.where((lvl == i)[:, None, None, None], o, 0.0)
    return out * roi_valid[:, None, None, None]


def _fixture(seed=0, R=64, C=16, H0=64, W0=96):
    rng = np.random.RandomState(seed)
    strides = (4, 8, 16, 32)
    feats = [jnp.asarray(rng.randn(H0 >> i, W0 >> i, C), jnp.float32)
             for i in range(4)]
    # spread ROI scales across all four levels (area ~ [8, 500]^2 in
    # image coords; image is H0*4 x W0*4)
    cx = rng.uniform(0, W0 * 4, R)
    cy = rng.uniform(0, H0 * 4, R)
    side = np.exp(rng.uniform(np.log(8), np.log(500), (R, 2)))
    rois = np.stack([cx - side[:, 0] / 2, cy - side[:, 1] / 2,
                     cx + side[:, 0] / 2, cy + side[:, 1] / 2], -1)
    # a few degenerate / fully-outside / border boxes
    rois[0] = [0, 0, 0.3, 0.3]
    rois[1] = [-50, -50, -10, -10]
    rois[2] = [W0 * 4 - 1, H0 * 4 - 1, W0 * 4 + 30, H0 * 4 + 30]
    rois[3] = [5, 5, 5, 5]
    valid = rng.rand(R) > 0.2
    return feats, jnp.asarray(rois, jnp.float32), jnp.asarray(valid), strides


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_matches_masked_sum(seed):
    feats, rois, valid, strides = _fixture(seed)
    got = multi_level_roi_align(feats, rois, valid, strides)
    want = _masked_sum_reference(feats, rois, valid, strides)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_level_rois_decoupled():
    """level_rois maps levels while rois pools (roi_scale_factor path)."""
    feats, rois, valid, strides = _fixture(2)
    lr = rois * 1.3
    got = multi_level_roi_align(feats, rois, valid, strides, level_rois=lr)
    want = _masked_sum_reference(feats, rois, valid, strides, level_rois=lr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_out_size_14():
    feats, rois, valid, strides = _fixture(3)
    got = multi_level_roi_align(feats, rois, valid, strides, out_size=14)
    want = _masked_sum_reference(feats, rois, valid, strides, out_size=14)
    assert got.shape == (rois.shape[0], 14, 14, feats[0].shape[-1])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_gradients_match():
    feats, rois, valid, strides = _fixture(4, R=16, C=8)

    def loss_fused(fs):
        return multi_level_roi_align(fs, rois, valid, strides).sum()

    def loss_ref(fs):
        return _masked_sum_reference(fs, rois, valid, strides).sum()

    g1 = jax.grad(loss_fused)(feats)
    g2 = jax.grad(loss_ref)(feats)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_bf16_odd_extent_border():
    """Coordinate math must stay f32: bf16 rounds a level width like 339
    to 340, which would push the right-border corner index into the next
    row (wrapped gather). Level-0 map is W=339 with its last column set
    to 50 (elsewhere 1); a right-border ROI must pool ~50 at its right
    output column, not a mix with the wrapped row's 1s."""
    strides = (4, 8, 16, 32)
    H0, W0 = 64, 339
    feats = []
    for i in range(4):
        f = np.ones((H0 >> i, -(-W0 // (1 << i)), 8), np.float32)
        feats.append(f)
    feats[0][:, -1, :] = 50.0
    feats_bf = [jnp.asarray(f, jnp.bfloat16) for f in feats]
    # small ROI (maps to level 0) flush against the right image border
    rois = jnp.asarray([[W0 * 4 - 16.0, 40.0, W0 * 4 - 0.01, 90.0]],
                       jnp.float32)
    valid = jnp.ones((1,), bool)
    out = np.asarray(multi_level_roi_align(feats_bf, rois, valid,
                                           strides)).astype(np.float32)
    # right output column samples sit in the last feature column
    assert out[0, :, -1, :].min() > 40.0, out[0, :, -1, 0]


def test_env_opt_out(monkeypatch):
    feats, rois, valid, strides = _fixture(5)
    monkeypatch.setenv("DSKD_ROI_FUSED", "0")
    want = multi_level_roi_align(feats, rois, valid, strides)
    monkeypatch.setenv("DSKD_ROI_FUSED", "1")
    got = multi_level_roi_align(feats, rois, valid, strides)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

"""DyHead attention neck: DyReLU math, block shapes, ATSS integration."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.dyhead import DyHead, DyHeadBlock, DyReLU, hard_sigmoid


def test_hard_sigmoid_and_dyrelu_identity_region():
    x = jnp.linspace(-10, 10, 21)
    hs = np.asarray(hard_sigmoid(x))
    assert hs.min() == 0.0 and hs.max() == 1.0
    # DyReLU with zeroed params: coeffs = hsig(0)-0.5 = 0 -> a1=1, rest 0
    # -> identity via max(x, 0*x) = max(x, 0)... a2=0,b2=0: max(x, 0)
    m = DyReLU(8)
    xin = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 8)
                      .astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), xin)
    z = jax.tree.map(jnp.zeros_like, v)
    out = m.apply(z, xin)
    np.testing.assert_allclose(np.asarray(out),
                               np.maximum(np.asarray(xin), 0), rtol=1e-6)


def test_dyhead_block_shapes():
    rng = np.random.RandomState(0)
    feats = tuple(jnp.asarray(rng.randn(1, s, s, 32).astype(np.float32))
                  for s in (16, 8, 4))
    blk = DyHeadBlock(32)
    v = blk.init(jax.random.PRNGKey(0), feats)
    outs = blk.apply(v, feats)
    assert [o.shape for o in outs] == [f.shape for f in feats]
    neck = DyHead(32, num_blocks=2)
    v2 = neck.init(jax.random.PRNGKey(0), feats)
    outs2 = neck.apply(v2, feats)
    assert [o.shape for o in outs2] == [f.shape for f in feats]


def test_atss_with_dyhead_forward_and_step():
    from dskd_tpu.models.atss import ATSS
    model = ATSS(num_classes=6, depth=18, dyhead_blocks=2,
                 head_stacked_convs=0)
    x = jnp.zeros((1, 64, 64, 3))
    hw = jnp.array([[64, 64]], jnp.int32)
    v = model.init(jax.random.PRNGKey(0), x, hw)
    assert "dyhead" in v["params"]
    out = model.apply(v, x, hw)
    assert len(out.head.cls_scores) == 5


def test_upsample_align_corners_torch_oracle():
    """_upsample_align_corners == F.interpolate(..., align_corners=True)
    (the reference's high-level path, dyhead.py:118-122)."""
    import torch
    import torch.nn.functional as F

    from dskd_tpu.models.dyhead import _upsample_align_corners

    rng = np.random.RandomState(0)
    for (h2, w2), (H, W) in [((4, 6), (8, 11)), ((3, 3), (6, 6)),
                             ((5, 7), (9, 13))]:
        x = rng.randn(2, h2, w2, 3).astype(np.float32)
        got = np.asarray(_upsample_align_corners(jnp.asarray(x), (H, W)))
        exp = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                            size=(H, W), mode="bilinear",
                            align_corners=True).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, exp, atol=1e-5)

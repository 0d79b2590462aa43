"""CARAFE op: torch unfold oracle + FPN-CARAFE wiring."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.ops.carafe import CARAFE, carafe_reassemble


def test_carafe_reassemble_torch_oracle():
    """Reassembly must equal the naive torch unfold formulation of the
    mmcv CARAFE kernel contract."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    B, H, W, C, k, s = 2, 5, 6, 7, 5, 2
    x = rng.randn(B, H, W, C).astype(np.float32)
    kern = rng.rand(B, s * H, s * W, k * k).astype(np.float32)
    kern = kern / kern.sum(-1, keepdims=True)

    got = np.asarray(carafe_reassemble(jnp.asarray(x), jnp.asarray(kern),
                                       k_up=k, scale=s))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)            # (B, C, H, W)
    # (B, C*k*k, H*W) patches
    pat = F.unfold(xt, k, padding=k // 2).reshape(B, C, k * k, H, W)
    want = np.zeros((B, s * H, s * W, C), np.float32)
    for oy in range(s * H):
        for ox in range(s * W):
            p = pat[:, :, :, oy // s, ox // s].numpy()       # (B, C, kk)
            want[:, oy, ox] = (p * kern[:, oy, ox][:, None, :]).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_carafe_module_shapes_and_softmax():
    x = jnp.asarray(np.random.RandomState(1)
                    .randn(1, 8, 10, 16).astype(np.float32))
    m = CARAFE(channels=16)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 16, 20, 16)
    assert np.all(np.isfinite(np.asarray(y)))


def test_fpn_carafe_differs_from_nearest():
    from dskd_tpu.models.fpn import FPN
    rng = np.random.RandomState(2)
    feats = [jnp.asarray(rng.randn(1, 16 // (2 ** i), 16 // (2 ** i),
                                   8 * (2 ** i)).astype(np.float32))
             for i in range(4)]
    fc = FPN(out_channels=16, num_outs=5, start_level=0,
             add_extra_convs="", upsample="carafe")
    vc = fc.init(jax.random.PRNGKey(0), feats)
    assert any("carafe" in k for k in vc["params"])
    outs = fc.apply(vc, feats)
    assert len(outs) == 5 and outs[0].shape == (1, 16, 16, 16)

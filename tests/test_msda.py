"""MS-deformable-attention sampling core vs a torch grid_sample oracle.

The oracle transcribes the semantics of the reference's CUDA op (mmcv
MultiScaleDeformableAttention / ms_deform_attn: per level, bilinear
grid_sample with align_corners=False and zero padding, weighted sum over
levels x points). This is the hardest-kernel parity check (SURVEY §2.8).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_msda_oracle(value, spatial_shapes, locs, weights):
    """value: (B, S, H, D); locs: (B, Q, H, L, P, 2); weights same minus 2."""
    B, S, H, D = value.shape
    _, Q = locs.shape[:2]
    L = len(spatial_shapes)
    out = torch.zeros(B, Q, H, D)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, start:start + h * w]            # (B, hw, H, D)
        v = v.permute(0, 2, 3, 1).reshape(B * H, D, h, w)
        g = locs[:, :, :, lvl] * 2 - 1               # (B, Q, H, P, 2)
        g = g.permute(0, 2, 1, 3, 4).reshape(B * H, Q, -1, 2)
        sampled = F.grid_sample(v, g, mode="bilinear",
                                padding_mode="zeros", align_corners=False)
        sampled = sampled.reshape(B, H, D, Q, -1)    # (B, H, D, Q, P)
        wgt = weights[:, :, :, lvl].permute(0, 2, 1, 3)  # (B, H, Q, P)
        out += (sampled * wgt[:, :, None]).sum(-1).permute(0, 3, 1, 2)
        start += h * w
    return out.reshape(B, Q, H * D)


def test_msda_matches_grid_sample():
    import jax.numpy as jnp

    from dskd_tpu.ops.msda import ms_deform_attn_core

    rng = np.random.RandomState(0)
    B, H, D, Q, P = 2, 4, 8, 10, 4
    shapes = [(8, 8), (4, 4), (2, 2)]
    S = sum(h * w for h, w in shapes)
    value = rng.randn(B, S, H, D).astype(np.float32)
    # locations straddling borders to exercise zero-padding
    locs = rng.rand(B, Q, H, len(shapes), P, 2).astype(np.float32) * 1.3 - .15
    w = rng.rand(B, Q, H, len(shapes), P).astype(np.float32)
    w = w / w.sum((-1, -2), keepdims=True)

    got = np.asarray(ms_deform_attn_core(
        jnp.array(value), shapes, jnp.array(locs), jnp.array(w)))
    expect = torch_msda_oracle(torch.from_numpy(value), shapes,
                               torch.from_numpy(locs),
                               torch.from_numpy(w)).numpy()
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_msda_gradients_finite():
    import jax
    import jax.numpy as jnp

    from dskd_tpu.ops.msda import ms_deform_attn_core

    rng = np.random.RandomState(1)
    shapes = [(4, 4), (2, 2)]
    S = sum(h * w for h, w in shapes)
    value = jnp.array(rng.randn(1, S, 2, 4).astype(np.float32))
    locs = jnp.array(rng.rand(1, 3, 2, 2, 2, 2).astype(np.float32))
    w = jnp.array(rng.rand(1, 3, 2, 2, 2).astype(np.float32))

    def f(v, l, w):
        return ms_deform_attn_core(v, shapes, l, w).sum()

    grads = jax.grad(f, argnums=(0, 1, 2))(value, locs, w)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()

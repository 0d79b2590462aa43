"""DeformConv2d numeric oracles: zero offsets == plain conv; nonzero
offsets vs an explicit numpy bilinear-sampling reference."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.ops.deform_conv import DeformConv2d, deform_conv2d


def np_deform_conv(x, offsets, weight, stride=1, padding=1, dilation=1,
                   mask=None):
    """Explicit-loop reference with mmcv semantics."""
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    off = offsets.reshape(B, Ho, Wo, K, 2)
    out = np.zeros((B, Ho, Wo, Cout), np.float32)

    def bil(b, y, xx):
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        ty, tx = y - y0, xx - x0
        v = np.zeros(Cin, np.float32)
        for (yy, xc, w) in ((y0, x0, (1 - ty) * (1 - tx)),
                            (y0, x0 + 1, (1 - ty) * tx),
                            (y0 + 1, x0, ty * (1 - tx)),
                            (y0 + 1, x0 + 1, ty * tx)):
            if 0 <= yy < H and 0 <= xc < W:
                v += w * x[b, yy, xc]
        return v

    for b in range(B):
        for i in range(Ho):
            for j in range(Wo):
                for a in range(kh):
                    for c in range(kw):
                        k = a * kw + c
                        dy, dx = off[b, i, j, k]
                        y = i * stride - padding + a * dilation + dy
                        xx = j * stride - padding + c * dilation + dx
                        v = bil(b, y, xx)
                        if mask is not None:
                            v = v * mask[b, i, j, k]
                        out[b, i, j] += v @ weight[a, c]
    return out


def test_zero_offsets_equal_plain_conv():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    w = rng.randn(3, 3, 4, 6).astype(np.float32)
    offsets = np.zeros((1, 8, 8, 18), np.float32)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offsets),
                                   jnp.asarray(w)))
    import jax.lax as lax
    want = np.asarray(lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_matches_numpy_reference():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 6, 7, 3).astype(np.float32)
    w = rng.randn(3, 3, 3, 5).astype(np.float32)
    offsets = rng.randn(2, 6, 7, 18).astype(np.float32) * 1.5
    mask = rng.rand(2, 6, 7, 9).astype(np.float32)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offsets),
                                   jnp.asarray(w), mask=jnp.asarray(mask)))
    want = np_deform_conv(x, offsets, w, mask=mask)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_stride2_shapes_and_module():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    m = DeformConv2d(out_channels=6, stride=2, modulated=True)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (1, 4, 4, 6)
    # conv_offset zero-init => acts as a plain conv at init (mask=0.5)
    import jax.lax as lax
    w = variables["params"]["kernel"]
    want = 0.5 * lax.conv_general_dilated(
        x, w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    # gradients flow
    g = jax.grad(lambda v: m.apply(v, x).sum())(variables)
    assert np.isfinite(jax.tree.leaves(g["params"])[0]).all()

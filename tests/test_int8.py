"""Int8 teacher path: quantized matmul oracle, interceptor selectivity,
end-to-end closeness of the int8 teacher forward to the f32 one."""
import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp

from dskd_tpu.ops.int8 import (apply_int8, int8_conv, int8_dense,
                               make_int8_interceptor)


def test_int8_dense_oracle():
    """Exact restatement of the symmetric-quantization contract."""
    rng = np.random.RandomState(0)
    x = rng.randn(5, 256).astype(np.float32)
    w = rng.randn(256, 192).astype(np.float32) * 0.1
    b = rng.randn(192).astype(np.float32)

    got = np.asarray(int8_dense(jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(b)))
    sx = np.abs(x).max() / 127.0
    xq = np.clip(np.round(x / sx), -127, 127)
    sw = np.abs(w).max(axis=0) / 127.0
    wq = np.clip(np.round(w / sw), -127, 127)
    want = (xq @ wq) * (sx * sw) + b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # int8 matmul approximates the f32 one to quantization error
    rel = np.abs(got - (x @ w + b)).max() / np.abs(x @ w + b).max()
    assert rel < 0.05


def test_int8_conv_matches_f32():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8, 128).astype(np.float32)
    w = rng.randn(3, 3, 128, 128).astype(np.float32) * 0.05
    got = np.asarray(int8_conv(jnp.asarray(x), jnp.asarray(w), None,
                               (1, 1), [(1, 1), (1, 1)]))
    ref = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.05
    assert got.shape == ref.shape


class _Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(128, (3, 3), padding=[(1, 1), (1, 1)],
                            name="c1")(x))
        x = x.mean(axis=(1, 2))
        x = nn.relu(nn.Dense(256, name="fc1")(x))
        x = nn.Dense(256, name="fc2")(x)
        return nn.Dense(7, name="head")(x)        # small: stays f32


def test_interceptor_quantizes_big_skips_small():
    rng = jax.random.PRNGKey(0)
    net = _Net()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 128))
    v = net.init(rng, x)
    ref = np.asarray(net.apply(v, x))
    got = np.asarray(apply_int8(net, v, x))
    # end-to-end close but not identical (big layers quantized)
    assert not np.array_equal(got, ref)
    rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 0.1

    # the small head alone is bit-exact under the interceptor
    feats = jax.random.normal(jax.random.PRNGKey(2), (2, 256))
    head = nn.Dense(7)
    hv = head.init(rng, feats)
    with nn.intercept_methods(make_int8_interceptor(hv["params"])):
        out_i = head.apply(hv, feats)
    np.testing.assert_array_equal(np.asarray(out_i),
                                  np.asarray(head.apply(hv, feats)))


def test_teacher_info_int8_close(monkeypatch):
    """Flagship teacher forward under DSKD_INT8_TEACHER agrees with the
    f32 teacher on detections to quantization tolerance."""
    from dskd_tpu.models.detector import GFLDeformableDETR
    from dskd_tpu.models.gfl_detr_loss import DetLossConfig
    from dskd_tpu.train.step import Batch, teacher_info

    model = GFLDeformableDETR(num_query=8, num_encoder_layers=1,
                              num_decoder_layers=1)
    B, H, W = 1, 64, 64
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.3)
    img_hw = jnp.asarray([[H, W]], np.int32)
    v = model.init(jax.random.PRNGKey(0), images, img_hw)
    batch = Batch(images, img_hw,
                  jnp.zeros((B, 4, 4)), jnp.zeros((B, 4), jnp.int32),
                  jnp.zeros((B, 4), bool))
    cfg = DetLossConfig(num_classes=80)

    monkeypatch.delenv("DSKD_INT8_TEACHER", raising=False)
    t_f32 = teacher_info(model, v, batch, cfg, teacher_max_per_img=4)
    monkeypatch.setenv("DSKD_INT8_TEACHER", "1")
    t_int8 = teacher_info(model, v, batch, cfg, teacher_max_per_img=4)

    s0 = np.asarray(t_f32.det.scores)
    s1 = np.asarray(t_int8.det.scores)
    np.testing.assert_allclose(s1, s0, atol=0.05)
    b0 = np.asarray(t_f32.det.bboxes)
    b1 = np.asarray(t_int8.det.bboxes)
    assert np.abs(b1 - b0).max() < 0.05 * max(H, W)

"""ConvWS + the gn/gn+ws recipe wiring (configs/gn, configs/gn+ws)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from dskd_tpu.models.conv_ws import ConvWS


def torch_conv_ws(x_nchw, w_oihw, bias, stride, padding, eps=1e-5):
    """mmcv ConvWS2d restated: standardize each out-channel's kernel
    over its fan-in with the unbiased std, then convolve."""
    w = w_oihw
    flat = w.view(w.size(0), -1)
    mean = flat.mean(dim=1).view(-1, 1, 1, 1)
    std = flat.std(dim=1).view(-1, 1, 1, 1)
    w = (w - mean) / (std + eps)
    return F.conv2d(x_nchw, w, bias, stride, padding)


def test_conv_ws_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 11, 6).astype(np.float32)
    m = ConvWS(8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(m.apply(v, jnp.asarray(x)))

    k = np.asarray(v["params"]["kernel"])            # (kh, kw, in, out)
    b = np.asarray(v["params"]["bias"])
    ref = torch_conv_ws(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(k.transpose(3, 2, 0, 1)).contiguous(),
        torch.from_numpy(b), stride=2, padding=1)
    np.testing.assert_allclose(out, ref.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-4, atol=2e-5)


def test_conv_ws_standardization_invariance():
    """WS makes the conv invariant to per-channel affine rescaling of the
    kernel (the property that lets it pair with GN)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    m = ConvWS(5, (3, 3), use_bias=False)
    v = m.init(jax.random.PRNGKey(0), x)
    base = np.asarray(m.apply(v, x))
    scale = jnp.asarray(rng.rand(5).astype(np.float32) * 3 + 0.5)
    v2 = {"params": {"kernel": v["params"]["kernel"] * scale}}
    np.testing.assert_allclose(np.asarray(m.apply(v2, x)), base,
                               rtol=2e-3, atol=2e-4)


def test_gn_ws_resnet_has_no_bn_state_and_trains_stage1():
    from dskd_tpu.models.resnet import ResNet

    m = ResNet(depth=50, norm="gn", ws=True, frozen_stages=-1)
    x = jnp.asarray(np.random.RandomState(2)
                    .randn(1, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    # GN has no running statistics: params is the only collection
    assert set(v.keys()) == {"params"}
    keys = [jax.tree_util.keystr(p) for p, _ in
            jax.tree_util.tree_leaves_with_path(v["params"])]
    assert any("scale" in k and "bn1" in k for k in keys)   # GN scale
    g = jax.grad(lambda p: sum(
        o.sum() for o in m.apply({"params": p}, x)))(v["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(g))


def test_faster_rcnn_gn_ws_roi_head_shape():
    from dskd_tpu.models.faster_rcnn import FasterRCNN

    m = FasterRCNN(depth=18, norm="gn", ws=True, frozen_stages=-1,
                   num_classes=6)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    hw = jnp.asarray([[64, 64]], jnp.int32)
    v = m.init(jax.random.PRNGKey(0), x, hw, method=FasterRCNN.init_all)
    cls, reg = m.apply(v, jnp.zeros((3, 7, 7, 256), jnp.float32),
                       method=FasterRCNN.roi_forward)
    assert cls.shape == (3, 7) and reg.shape == (3, 24)
    # the conv4fc1 head is in use
    assert "roi_bbox_head" in v["params"]
    assert any("shared_conv" in k for k in v["params"]["roi_bbox_head"])

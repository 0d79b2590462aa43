"""CenterNet: gaussian targets, heatmap loss oracle, decode roundtrip."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from dskd_tpu.core import losses as L
from dskd_tpu.models.centernet import (CenterNet, CenterNetLossConfig,
                                       centernet_get_bboxes,
                                       centernet_loss, render_targets)


def test_gaussian_focal_loss_torch_oracle():
    rng = np.random.RandomState(0)
    pred = rng.rand(64).astype(np.float32) * 0.98 + 0.01
    tgt = rng.rand(64).astype(np.float32)
    tgt[:5] = 1.0
    p, t = torch.tensor(pred), torch.tensor(tgt)
    eps = 1e-12
    pos = -(p + eps).log() * (1 - p) ** 2 * t.eq(1)
    neg = -(1 - p + eps).log() * p ** 2 * (1 - t) ** 4
    want = float((pos + neg).mean())
    got = float(L.gaussian_focal_loss(jnp.asarray(pred), jnp.asarray(tgt)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_render_targets():
    gts = jnp.asarray(np.array([[8, 8, 40, 40]], np.float32))
    labels = jnp.asarray(np.array([3], np.int32))
    valid = jnp.asarray(np.array([True]))
    hm, wh, off, centers, v = render_targets(gts, labels, valid, 5,
                                             (16, 16), stride=4)
    hm = np.asarray(hm)
    # center at ((8+40)/2)/4 = 6 -> exact 1.0 at (6, 6) on channel 3
    assert hm[6, 6, 3] == 1.0
    assert hm[:, :, [0, 1, 2, 4]].max() == 0.0
    assert 0 < hm[5, 6, 3] < 1.0             # gaussian neighborhood
    np.testing.assert_allclose(np.asarray(wh)[0], [8, 8])   # 32px / 4
    np.testing.assert_allclose(np.asarray(off)[0], [0, 0])  # exact center
    assert np.asarray(centers)[0].tolist() == [6, 6]


def test_centernet_train_and_decode():
    model = CenterNet(num_classes=4, depth=18)
    B, H, W = 2, 64, 64
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(variables, images, img_hw)
    assert out.heatmap.shape == (B, 16, 16, 4)   # stride 4
    assert out.wh.shape == (B, 16, 16, 2)

    G = 3
    xy = rng.rand(B, G, 2).astype(np.float32) * 20
    wh_ = rng.rand(B, G, 2).astype(np.float32) * 25 + 10
    gt = jnp.asarray(np.concatenate([xy, xy + wh_], -1))
    labels = jnp.asarray(rng.randint(0, 4, (B, G)).astype(np.int32))
    valid = jnp.asarray(np.ones((B, G), bool))
    cfg = CenterNetLossConfig(num_classes=4)

    def loss_fn(params):
        o = model.apply({"params": params,
                         "batch_stats": variables.get("batch_stats", {})},
                        images, img_hw)
        ld = centernet_loss(o, gt, labels, valid, cfg)
        return sum(ld.values()), ld

    (total, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total))
    for k in ("loss_center_heatmap", "loss_wh", "loss_offset"):
        assert np.isfinite(float(ld[k])) and float(ld[k]) >= 0, k
    g = grads["bbox_head"]["heatmap_out"]["kernel"]
    assert float(jnp.abs(g).max()) > 0

    det = centernet_get_bboxes(out, img_hw, topk=10)
    assert det["bboxes"].shape == (B, 10, 4)
    b = np.asarray(det["bboxes"])
    assert b.min() >= 0 and b.max() <= 64


def test_decode_recovers_planted_peak():
    """A hand-planted heatmap peak decodes to the expected box."""
    from dskd_tpu.models.centernet import CenterNetOutputs

    B, H, W, C = 1, 16, 16, 3
    heat = np.full((B, H, W, C), -10.0, np.float32)
    heat[0, 5, 7, 1] = 10.0                      # strong peak
    wh = np.zeros((B, H, W, 2), np.float32)
    wh[0, 5, 7] = [6.0, 4.0]
    off = np.zeros((B, H, W, 2), np.float32)
    off[0, 5, 7] = [0.25, 0.5]
    out = CenterNetOutputs(jnp.asarray(heat), jnp.asarray(wh),
                           jnp.asarray(off), ())
    det = centernet_get_bboxes(out, jnp.asarray([[64, 64]], jnp.int32),
                               topk=5)
    assert int(det["labels"][0, 0]) == 1
    cx, cy = (7 + 0.25) * 4, (5 + 0.5) * 4
    np.testing.assert_allclose(
        np.asarray(det["bboxes"])[0, 0],
        [cx - 12, cy - 8, cx + 12, cy + 8], atol=1e-3)

"""SSD300: level shapes, anchors, hard-negative mining, loss/decode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dskd_tpu.models.ssd import (SSD, SSDLossConfig, ssd_anchors,
                                 ssd_detection_loss, ssd_get_bboxes,
                                 ssd_level_anchors)


def test_level_anchor_counts_and_sizes():
    a0 = np.asarray(ssd_level_anchors(0))
    a1 = np.asarray(ssd_level_anchors(1))
    assert a0.shape == (4, 4) and a1.shape == (6, 4)
    # SSDAnchorGenerator centers at stride/2 (anchor_generator.py:503):
    # level 0 stride 8 -> center 4; first anchor is the min_size square
    np.testing.assert_allclose(a0[0], [4 - 10.5, 4 - 10.5,
                                       4 + 10.5, 4 + 10.5])
    # second is the geometric-mean square sqrt(21*45)
    s = np.sqrt(21 * 45) / 2
    np.testing.assert_allclose(a0[1], [4 - s, 4 - s, 4 + s, 4 + s],
                               rtol=1e-5)
    # level 5 (stride 300, one cell) is centered on the 300 image
    a5 = np.asarray(ssd_level_anchors(5))
    np.testing.assert_allclose(a5[0], [150 - 130.5, 150 - 130.5,
                                       150 + 130.5, 150 + 130.5])


@pytest.fixture(scope="module")
def setup():
    model = SSD(num_classes=6)
    B, S = 1, 300
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, S, S, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[S, S]], (B, 1)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(variables, images, img_hw)
    return model, variables, images, img_hw, out


def test_ssd300_level_shapes(setup):
    _, _, _, _, out = setup
    sizes = [c.shape[1:3] for c in out.cls_scores]
    assert sizes == [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    assert out.cls_scores[0].shape[-1] == 4 * 7     # A=4, C+1=7
    assert out.cls_scores[1].shape[-1] == 6 * 7


def test_ssd_loss_hard_negative_mining(setup):
    model, variables, images, img_hw, out = setup
    sizes = [c.shape[1:3] for c in out.cls_scores]
    anchors = ssd_anchors(sizes)
    assert anchors.shape[0] == sum(
        h * w * a for (h, w), a in zip(sizes, (4, 6, 6, 6, 4, 4)))

    rng = np.random.RandomState(1)
    G = 4
    xy = rng.rand(1, G, 2).astype(np.float32) * 150
    wh = rng.rand(1, G, 2).astype(np.float32) * 100 + 30
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, 6, (1, G)).astype(np.int32))
    valid = jnp.asarray(np.ones((1, G), bool))
    cfg = SSDLossConfig(num_classes=6)

    ld = ssd_detection_loss(out, anchors, gt, labels, valid, cfg)
    assert np.isfinite(float(ld["loss_cls"]))
    assert np.isfinite(float(ld["loss_bbox"]))

    def loss_fn(params):
        o = model.apply({"params": params}, images, img_hw)
        d = ssd_detection_loss(o, anchors, gt, labels, valid, cfg)
        return d["loss_cls"] + d["loss_bbox"]

    grads = jax.grad(loss_fn)(variables["params"])
    g = grads["cls_conv0"]["kernel"]
    assert float(jnp.abs(g).max()) > 0
    # L2Norm scale param exists and receives gradient
    g2 = grads["backbone"]["l2norm"]["scale"]
    assert float(jnp.abs(g2).max()) > 0


def test_ssd_get_bboxes(setup):
    _, _, _, img_hw, out = setup
    sizes = [c.shape[1:3] for c in out.cls_scores]
    anchors = ssd_anchors(sizes)
    det = ssd_get_bboxes(out, anchors, img_hw, score_thr=0.0,
                         nms_pre=200, max_per_img=20)
    assert det["bboxes"].shape == (1, 20, 4)
    b = np.asarray(det["bboxes"])
    assert b.min() >= 0 and b.max() <= 300

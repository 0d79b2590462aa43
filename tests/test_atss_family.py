"""ATSS detector family: shapes, loss/grads, centerness targets, decode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dskd_tpu.models.atss import (ATSS, ATSSLossConfig, _centerness_target,
                                  atss_anchors, atss_detection_loss,
                                  atss_get_bboxes)


def test_centerness_target_values():
    anchors = jnp.asarray(np.array([[28, 28, 36, 36]], np.float32))
    # anchor center (32, 32) exactly centers the gt -> centerness 1
    gts = jnp.asarray(np.array([[24, 24, 40, 40]], np.float32))
    np.testing.assert_allclose(
        np.asarray(_centerness_target(anchors, gts)), [1.0], atol=1e-6)
    # center on the gt edge -> 0
    gts2 = jnp.asarray(np.array([[32, 24, 48, 40]], np.float32))
    np.testing.assert_allclose(
        np.asarray(_centerness_target(anchors, gts2)), [0.0], atol=1e-6)


@pytest.fixture(scope="module")
def setup():
    model = ATSS(num_classes=6, depth=18)
    B, H, W = 2, 64, 64
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(variables, images, img_hw)
    return model, variables, images, img_hw, out


def test_forward_shapes(setup):
    _, _, _, _, out = setup
    sizes = [c.shape[1:3] for c in out.head.cls_scores]
    assert sizes == [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
    assert out.head.cls_scores[0].shape[-1] == 6      # ONE anchor per cell
    assert out.head.bbox_preds[0].shape[-1] == 4


def test_loss_and_grads(setup):
    model, variables, images, img_hw, out = setup
    sizes = [c.shape[1:3] for c in out.head.cls_scores]
    anchors, counts = atss_anchors(sizes)
    assert anchors.shape[0] == sum(h * w for h, w in sizes)

    rng = np.random.RandomState(1)
    G = 3
    xy = rng.rand(2, G, 2).astype(np.float32) * 25
    wh = rng.rand(2, G, 2).astype(np.float32) * 30 + 10
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, 6, (2, G)).astype(np.int32))
    valid = jnp.asarray(np.ones((2, G), bool))
    cfg = ATSSLossConfig(num_classes=6)

    def loss_fn(params):
        o = model.apply({"params": params,
                         "batch_stats": variables.get("batch_stats", {})},
                        images, img_hw)
        ld = atss_detection_loss(o.head, anchors, counts, gt, labels,
                                 valid, cfg)
        return sum(ld.values()), ld

    (total, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total))
    for k in ("loss_cls", "loss_bbox", "loss_centerness"):
        assert np.isfinite(float(ld[k])), k
    for leaf in ("atss_cls", "atss_reg", "atss_centerness"):
        g = grads["bbox_head"][leaf]["kernel"]
        assert float(jnp.abs(g).max()) > 0, leaf


def test_get_bboxes(setup):
    _, _, _, img_hw, out = setup
    sizes = [c.shape[1:3] for c in out.head.cls_scores]
    anchors, _ = atss_anchors(sizes)
    det = atss_get_bboxes(out.head, anchors, img_hw, score_thr=0.0,
                          nms_pre=80, max_per_img=10)
    assert det["bboxes"].shape == (2, 10, 4)
    b = np.asarray(det["bboxes"])
    assert b.min() >= 0 and b.max() <= 64

"""RetinaNet: forward shapes, loss finiteness/grads, decode sanity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dskd_tpu.models.retinanet import (RetinaLossConfig, RetinaNet,
                                       retina_anchors,
                                       retina_detection_loss,
                                       retina_get_bboxes)


@pytest.fixture(scope="module")
def setup():
    model = RetinaNet(num_classes=6, depth=18)
    B, H, W = 2, 64, 64
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(variables, images, img_hw)
    return model, variables, images, img_hw, out


def test_forward_shapes(setup):
    _, _, images, _, out = setup
    A = 9
    sizes = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
    assert len(out.head.cls_scores) == 5
    for c, r, (h, w) in zip(out.head.cls_scores, out.head.bbox_preds,
                            sizes):
        assert c.shape == (2, h, w, A * 6)
        assert r.shape == (2, h, w, A * 4)


def test_loss_and_grads(setup):
    model, variables, images, img_hw, out = setup
    sizes = [c.shape[1:3] for c in out.head.cls_scores]
    anchors = retina_anchors(sizes)
    assert anchors.shape[0] == sum(h * w * 9 for h, w in sizes)

    rng = np.random.RandomState(1)
    G = 4
    xy = rng.rand(2, G, 2).astype(np.float32) * 30
    wh = rng.rand(2, G, 2).astype(np.float32) * 25 + 8
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, 6, (2, G)).astype(np.int32))
    valid = jnp.asarray(np.tile(np.arange(G) < 3, (2, 1)))
    cfg = RetinaLossConfig(num_classes=6)

    def loss_fn(params):
        o = model.apply({"params": params,
                         "batch_stats": variables.get("batch_stats", {})},
                        images, img_hw)
        losses = retina_detection_loss(o.head, anchors, gt, labels, valid,
                                       cfg)
        return losses["loss_cls"] + losses["loss_bbox"], losses

    (total, losses), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(total))
    assert float(losses["loss_bbox"]) > 0
    g = grads["bbox_head"]["retina_cls"]["kernel"]
    assert float(jnp.abs(g).max()) > 0
    # prior-prob bias init: untrained cls loss should be moderate, not huge
    assert float(losses["loss_cls"]) < 50


def test_get_bboxes(setup):
    _, _, _, img_hw, out = setup
    sizes = [c.shape[1:3] for c in out.head.cls_scores]
    anchors = retina_anchors(sizes)
    det = retina_get_bboxes(out.head, anchors, img_hw, score_thr=0.0,
                            nms_pre=200, max_per_img=20)
    assert det["bboxes"].shape == (2, 20, 4)
    b = np.asarray(det["bboxes"])
    assert (b[..., 2] >= b[..., 0] - 1e-3).all()
    assert b[..., 0::2].min() >= 0 and b[..., 0::2].max() <= 64

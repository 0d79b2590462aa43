"""Cascade R-CNN: stage losses, refinement wiring, ensemble decode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dskd_tpu.models.cascade_rcnn import (CascadeRCNN,
                                          cascade_forward_train,
                                          cascade_get_bboxes)
from dskd_tpu.models.faster_rcnn import rpn_proposals


@pytest.fixture(scope="module")
def setup():
    model = CascadeRCNN(num_classes=5, depth=18)
    B, H, W = 2, 64, 64
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw,
                           method=CascadeRCNN.init_all)
    out = model.apply(variables, images, img_hw)
    return model, variables, images, img_hw, out


def test_cascade_train_losses_and_grads(setup):
    model, variables, images, img_hw, out = setup
    rng = np.random.RandomState(1)
    G = 3
    xy = rng.rand(2, G, 2).astype(np.float32) * 20
    wh = rng.rand(2, G, 2).astype(np.float32) * 25 + 10
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, 5, (2, G)).astype(np.int32))
    valid = jnp.asarray(np.ones((2, G), bool))

    def loss_fn(params):
        v = {"params": params,
             "batch_stats": variables.get("batch_stats", {})}
        o = model.apply(v, images, img_hw)
        props, _, pvalid = rpn_proposals(o.rpn, img_hw, nms_pre=64,
                                         max_total=64)
        ld = cascade_forward_train(
            lambda f, s: model.apply(v, f, s,
                                     method=CascadeRCNN.roi_forward),
            o.neck_feats, props, pvalid, gt, labels, valid,
            jax.random.PRNGKey(3), num_classes=5, num_samples=32)
        return sum(ld.values()), ld

    (total, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total))
    assert set(ld) == {f"s{i}.loss_{k}" for i in range(3)
                       for k in ("cls", "bbox")}
    # every stage head receives gradient (find_unused_parameters analog)
    for i in range(3):
        g = grads[f"bbox_head{i}"]["fc_cls"]["kernel"]
        assert float(jnp.abs(g).max()) > 0, i


def test_cascade_get_bboxes(setup):
    model, variables, images, img_hw, out = setup
    props, _, pvalid = rpn_proposals(out.rpn, img_hw, nms_pre=64,
                                     max_total=64)
    det = cascade_get_bboxes(
        lambda f, s: model.apply(variables, f, s,
                                 method=CascadeRCNN.roi_forward),
        out.neck_feats, props, pvalid, img_hw, num_classes=5,
        score_thr=0.0, max_per_img=10)
    assert det["bboxes"].shape == (2, 10, 4)
    b = np.asarray(det["bboxes"])
    assert b.min() >= 0 and b.max() <= 64

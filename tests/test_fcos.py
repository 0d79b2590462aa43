"""FCOS: target assignment semantics, loss/grads, decode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dskd_tpu.models.fcos import (FCOS, FCOSLossConfig, _fcos_targets,
                                  fcos_detection_loss, fcos_get_bboxes,
                                  fcos_points)


def test_target_assignment_semantics():
    # points on 2 levels; a small box should bind to the FINE level only
    # (regress_range), overlapping boxes resolve to the min-area GT
    points, meta = fcos_points([(8, 8), (4, 4)])
    gts = jnp.asarray(np.array([
        [8, 8, 40, 40],        # small box: max dist < 64 -> level 0
        [0, 0, 64, 64],        # bigger box containing the first
    ], np.float32))
    labels = jnp.asarray(np.array([2, 5], np.int32))
    valid = jnp.asarray(np.array([True, True]))
    lab, tgt, pos = _fcos_targets(points, meta, gts, labels, valid, 6)
    lab = np.asarray(lab)
    pts = np.asarray(points)
    # a point inside BOTH boxes takes the smaller area gt (label 2)
    inside_small = ((pts[:, 0] > 8) & (pts[:, 0] < 40)
                    & (pts[:, 1] > 8) & (pts[:, 1] < 40)
                    & (np.asarray(meta)[:, 0] == 8))
    assert (lab[inside_small & np.asarray(pos)] == 2).all()
    assert np.asarray(pos).any()
    # targets at positives are the ltrb distances to the assigned gt
    i = int(np.flatnonzero(inside_small & np.asarray(pos))[0])
    np.testing.assert_allclose(
        np.asarray(tgt)[i],
        [pts[i, 0] - 8, pts[i, 1] - 8, 40 - pts[i, 0], 40 - pts[i, 1]],
        atol=1e-4)


@pytest.fixture(scope="module")
def setup():
    model = FCOS(num_classes=5, depth=18)
    B, H, W = 2, 64, 64
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(variables, images, img_hw)
    return model, variables, images, img_hw, out


def test_loss_and_grads(setup):
    model, variables, images, img_hw, out = setup
    sizes = [c.shape[1:3] for c in out.head.cls_scores]
    points, meta = fcos_points(sizes)
    rng = np.random.RandomState(1)
    G = 3
    xy = rng.rand(2, G, 2).astype(np.float32) * 20
    wh = rng.rand(2, G, 2).astype(np.float32) * 30 + 10
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, 5, (2, G)).astype(np.int32))
    valid = jnp.asarray(np.ones((2, G), bool))
    cfg = FCOSLossConfig(num_classes=5)

    def loss_fn(params):
        o = model.apply({"params": params,
                         "batch_stats": variables.get("batch_stats", {})},
                        images, img_hw)
        ld = fcos_detection_loss(o.head, points, meta, gt, labels, valid,
                                 cfg)
        return sum(ld.values()), ld

    (total, ld), grads = jax.value_and_grad(loss_fn,
                                            has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total))
    for k in ("loss_cls", "loss_bbox", "loss_centerness"):
        assert np.isfinite(float(ld[k])), k
    for leaf in ("conv_cls", "conv_reg", "conv_centerness"):
        g = grads["bbox_head"][leaf]["kernel"]
        assert float(jnp.abs(g).max()) > 0, leaf
    # the per-level Scale params receive gradient
    g = grads["bbox_head"]["scale0"]["scale"]
    assert np.isfinite(float(g))


def test_get_bboxes(setup):
    _, _, _, img_hw, out = setup
    sizes = [c.shape[1:3] for c in out.head.cls_scores]
    points, _ = fcos_points(sizes)
    det = fcos_get_bboxes(out.head, points, img_hw, score_thr=0.0,
                          nms_pre=100, max_per_img=10)
    assert det["bboxes"].shape == (2, 10, 4)
    b = np.asarray(det["bboxes"])
    assert b.min() >= 0 and b.max() <= 64

"""GFL R50-FPN family tests: forward shapes, ATSS invariants, loss, boxes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dskd_tpu.core.atss import atss_assign
from dskd_tpu.models.gfl import GFL
from dskd_tpu.models.gfl_head import (GFLLossConfig, gfl_anchors,
                                      gfl_detection_loss, gfl_get_bboxes)


def test_atss_basic():
    # two levels of anchors on a 64x64 image, one gt box
    from dskd_tpu.core.anchors import base_anchors, grid_anchors
    # anchors sized near the gt and an off-grid gt: the perfectly
    # symmetric old geometry produced 4 TIED candidate IoUs, where
    # mean + unbiased-std (torch semantics) exceeds the max and ATSS
    # legitimately yields zero positives
    a1 = grid_anchors((8, 8), 8, base_anchors(32, (1.0,), (1.0,)))
    a2 = grid_anchors((4, 4), 16, base_anchors(64, (1.0,), (1.0,)))
    anchors = jnp.concatenate([a1, a2], 0)
    gt = jnp.array([[6.0, 10.0, 46.0, 42.0], [0, 0, 0, 0]])
    labels = jnp.array([3, 0], jnp.int32)
    valid = jnp.array([True, False])
    res = atss_assign(anchors, [64, 16], gt, labels, valid, num_classes=10,
                      topk=4)
    pos = np.asarray(res.pos_mask)
    assert pos.sum() > 0
    lab = np.asarray(res.labels)
    assert set(lab[pos].tolist()) == {3}
    # no anchor assigned to the padded gt
    assert (np.asarray(res.assigned_gt)[pos] == 0).all()


@pytest.fixture(scope="module")
def gfl_setup():
    model = GFL(depth=18, num_classes=10)
    B, H, W = 2, 128, 128
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.1)
    img_hw = jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    xy = rng.rand(B, 6, 2).astype(np.float32) * 60
    wh = rng.rand(B, 6, 2).astype(np.float32) * 40 + 16
    gt = np.concatenate([xy, np.minimum(xy + wh, 128)], -1)
    gt_labels = rng.randint(0, 10, (B, 6)).astype(np.int32)
    gt_valid = np.tile(np.arange(6) < 4, (B, 1))
    return (model, variables, images, img_hw, jnp.asarray(gt),
            jnp.asarray(gt_labels), jnp.asarray(gt_valid))


def test_gfl_forward_levels(gfl_setup):
    model, variables, images, img_hw, *_ = gfl_setup
    out = model.apply(variables, images, img_hw)
    assert len(out.head.cls_scores) == 5
    # strides 8..128
    assert out.head.cls_scores[0].shape[1] == 16
    assert out.head.cls_scores[4].shape[1] == 1
    assert out.head.bbox_preds[0].shape[-1] == 4 * 17


def test_gfl_loss_finite_and_grads(gfl_setup):
    model, variables, images, img_hw, gt, labels, valid = gfl_setup
    cfg = GFLLossConfig(num_classes=10)

    def loss_fn(params):
        out = model.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            images, img_hw)
        losses = gfl_detection_loss(out.head, gt, labels, valid, cfg)
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(total))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    gnorm = jnp.sqrt(sum(jnp.sum(g * g) for g in jax.tree.leaves(grads)))
    assert float(gnorm) > 0 and np.isfinite(float(gnorm))


def test_gfl_get_bboxes(gfl_setup):
    model, variables, images, img_hw, *_ = gfl_setup
    out = model.apply(variables, images, img_hw)
    det = gfl_get_bboxes(out.head, img_hw, score_thr=-1.0, nms_pre=100,
                         max_per_img=10)
    assert det["bboxes"].shape == (2, 10, 4)
    b = np.asarray(det["bboxes"])
    assert (b >= 0).all() and (b <= 128).all()

"""YOLOY family tests: SimOTA invariants, forward, loss + distill."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dskd_tpu.core.sim_ota import sim_ota_assign
from dskd_tpu.models.yoloy import (YOLOY, YOLOYDistillConfig,
                                   yoloy_compute_losses)
from dskd_tpu.models.yoloy_head import (YOLOYLossConfig, yoloy_decode,
                                        yoloy_get_bboxes, yoloy_priors)
from dskd_tpu.train.step import Batch


def test_yoloy_decode_roundtrip():
    priors = yoloy_priors([(4, 4)], strides=(8,))
    # zero pred -> box centered at prior, size stride
    boxes = np.asarray(yoloy_decode(priors, jnp.zeros((16, 4))))
    np.testing.assert_allclose(boxes[0], [-4, -4, 4, 4])


def test_sim_ota_invariants():
    rng = np.random.RandomState(0)
    priors = np.array(yoloy_priors([(8, 8)], strides=(8,)))
    priors[:, :2] += 4  # offset centers
    N = priors.shape[0]
    decoded = np.concatenate([priors[:, :2] - 6, priors[:, :2] + 6], -1)
    scores = rng.rand(N, 5).astype(np.float32) * 0.5
    gt = np.array([[8, 8, 30, 30], [40, 40, 60, 60], [0, 0, 0, 0]],
                  np.float32)
    labels = np.array([1, 3, 0], np.int32)
    valid = np.array([True, True, False])
    res = sim_ota_assign(jnp.array(scores), jnp.array(priors),
                         jnp.array(decoded), jnp.array(gt),
                         jnp.array(labels), jnp.array(valid), num_classes=5)
    pos = np.asarray(res.pos_mask)
    assert pos.sum() > 0
    lab = np.asarray(res.labels)
    assert set(lab[pos].tolist()) <= {1, 3}
    # nothing assigned to the padded gt
    assert (np.asarray(res.assigned_gt)[pos] != 2).all()
    # positives have their centers near assigned gts (in box or center)
    a = np.asarray(res.assigned_gt)
    for i in np.where(pos)[0]:
        g = gt[a[i]]
        cx, cy = priors[i, :2]
        assert (g[0] - 24 <= cx <= g[2] + 24) and (g[1] - 24 <= cy <= g[3] + 24)


@pytest.fixture(scope="module")
def yoloy_setup():
    model = YOLOY(depth=18, num_classes=8, neck_channels=64)
    B, H, W = 2, 64, 64
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.1)
    img_hw = jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    xy = rng.rand(B, 5, 2).astype(np.float32) * 30
    wh = rng.rand(B, 5, 2).astype(np.float32) * 20 + 10
    batch = Batch(images, img_hw,
                  jnp.asarray(np.concatenate([xy, xy + wh], -1)),
                  jnp.asarray(rng.randint(0, 8, (B, 5)).astype(np.int32)),
                  jnp.asarray(np.tile(np.arange(5) < 3, (B, 1))))
    return model, variables, batch


def test_yoloy_forward_levels(yoloy_setup):
    model, variables, batch = yoloy_setup
    out = model.apply(variables, batch.images, batch.img_hw)
    assert len(out.head.cls_scores) == 3
    assert out.head.cls_scores[0].shape == (2, 8, 8, 8)   # stride 8
    assert out.head.bbox_preds[2].shape == (2, 2, 2, 4)   # stride 32
    assert out.head.objectnesses[1].shape == (2, 4, 4, 1)


def test_yoloy_loss_and_distill(yoloy_setup):
    model, variables, batch = yoloy_setup
    out = model.apply(variables, batch.images, batch.img_hw)
    cfg = YOLOYLossConfig(num_classes=8)
    losses = yoloy_compute_losses(out, batch, cfg)
    assert {"loss_cls", "loss_bbox", "loss_obj"} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    dcfg = YOLOYDistillConfig.from_flags(cates_distill="hard + soft",
                                         feats_distill="kldv")
    losses = yoloy_compute_losses(out, batch, cfg, teacher_out=out,
                                  distill_cfg=dcfg, teacher_score_thr=-1.0,
                                  teacher_max_per_img=8)
    assert {"loss_kd", "loss_fd"} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_yoloy_get_bboxes(yoloy_setup):
    model, variables, batch = yoloy_setup
    out = model.apply(variables, batch.images, batch.img_hw)
    det = yoloy_get_bboxes(out.head, batch.img_hw, score_thr=-1.0,
                           nms_pre=50, max_per_img=10)
    assert det["bboxes"].shape == (2, 10, 4)
    b = np.asarray(det["bboxes"])
    assert (b >= 0).all() and (b <= 64).all()

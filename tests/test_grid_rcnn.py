"""Grid R-CNN: target/decode geometry round-trip, head shapes, train step."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.grid_rcnn import (GridHead, GridRCNN, extend_rois,
                                       grid_decode, grid_targets)


def test_grid_target_decode_roundtrip():
    """A perfect heatmap (the target itself as high logits) must decode
    back to (approximately) the GT box."""
    gt = jnp.asarray(np.array([[20.0, 30.0, 60.0, 80.0]]))
    erois = extend_rois(gt)                    # 2x around center
    tgt = grid_targets(erois, gt)
    assert tgt.shape == (1, 28, 28, 9)
    # every grid point paints at least one positive cell
    assert float(tgt.sum()) >= 9
    # binary-disk logits: ties bias the argmax; error bounded by the disk
    # radius in pixels (2 cells * ext_w/28 = 5.8px here)
    boxes = grid_decode(tgt * 12.0 - 6.0, erois)
    np.testing.assert_allclose(np.asarray(boxes)[0],
                               np.asarray(gt)[0], atol=6.0)
    # peaked logits (monotone-decreasing from the true point): error is at
    # most half a WHOLE-MAP cell per side. Each point's 28x28 channel is
    # its sub-window of the virtual 56 map (Grid R-CNN Plus), so the
    # synthetic logits are built in whole-map coords minus the origin.
    import jax.numpy as jnp2
    from dskd_tpu.models.grid_rcnn import HEATMAP, SUB_ORIGINS, WHOLE_MAP
    frac = np.array([[i / 2.0, j / 2.0] for i in range(3)
                     for j in range(3)], np.float32)
    g = np.asarray(gt)
    gx = g[:, 0:1] + frac[None, :, 0] * (g[:, 2:3] - g[:, 0:1])
    gy = g[:, 1:2] + frac[None, :, 1] * (g[:, 3:4] - g[:, 1:2])
    e = np.asarray(erois)
    px = (gx - e[:, 0:1]) / (e[:, 2:3] - e[:, 0:1]) * WHOLE_MAP  # (1, 9)
    py = (gy - e[:, 1:2]) / (e[:, 3:4] - e[:, 1:2]) * WHOLE_MAP
    ox = np.array([o[0] for o in SUB_ORIGINS], np.float32)
    oy = np.array([o[1] for o in SUB_ORIGINS], np.float32)
    cells = np.arange(HEATMAP, dtype=np.float32) + 0.5
    X = cells[None, :] + ox[:, None]                  # (9, 28) whole coords
    Y = cells[None, :] + oy[:, None]
    d2 = ((Y.T[None, :, None, :] - py[:, None, None, :]) ** 2
          + (X.T[None, None, :, :] - px[:, None, None, :]) ** 2)
    boxes2 = grid_decode(jnp2.asarray(-d2.astype(np.float32)), erois)
    cell = max(float(e[0, 2] - e[0, 0]),
               float(e[0, 3] - e[0, 1])) / WHOLE_MAP
    np.testing.assert_allclose(np.asarray(boxes2)[0], g[0],
                               atol=0.51 * cell)


def test_grid_head_shapes():
    m = GridHead(num_convs=2)
    x = jnp.zeros((2, 14, 14, 32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out["fused"].shape == (2, 28, 28, 9)
    assert out["unfused"].shape == (2, 28, 28, 9)
    # fusion transitions exist for the 4-neighbor topology (corner point 0
    # has 2 neighbors, center point 4 has 4)
    assert "fo_0_1" in v["params"] and "fo_0_2" not in v["params"]
    assert "so_4_3" in v["params"]


def test_grid_rcnn_family_step():
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    NC, HW, B = 6, 64, 1
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, 3, 2).astype(np.float32) * 20
    wh = rng.rand(B, 3, 2).astype(np.float32) * 25 + 10
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, NC, (B, 3)).astype(np.int32))
    valid = jnp.asarray(np.tile(np.arange(3) < 2, (B, 1)))

    model = GridRCNN(num_classes=NC, depth=18)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="grid_rcnn", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    cfg.rcnn_num_proposals = 16
    cfg.rcnn_num_samples = 16
    v = model.init(jax.random.PRNGKey(0), images, img_hw,
                   method=GridRCNN.init_all)
    assert "grid_head" in v["params"]
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("grid_rcnn", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, Batch(images, img_hw, gt, labels, valid))
    assert "loss_grid" in losses and "rcnn_loss_cls" in losses
    assert np.isfinite(float(losses["loss"]))

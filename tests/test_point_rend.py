"""PointRend: coarse head, uncertainty point sampling, point loss,
subdivision refinement."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.point_rend import (COARSE_SIZE, PointRendRCNN,
                                        point_targets, refine_masks_test,
                                        sample_train_points)

NC = 5


def _tiny_batch(B=1, HW=64, G=3):
    from dskd_tpu.train.step import Batch
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, G, 2).astype(np.float32) * 20
    wh = rng.rand(B, G, 2).astype(np.float32) * 25 + 10
    gtb = np.concatenate([xy, xy + wh], -1)
    yy, xx = np.mgrid[0:HW // 4, 0:HW // 4]
    gm = ((yy[None, None] * 4 >= gtb[:, :, 1, None, None])
          & (yy[None, None] * 4 <= gtb[:, :, 3, None, None])
          & (xx[None, None] * 4 >= gtb[:, :, 0, None, None])
          & (xx[None, None] * 4 <= gtb[:, :, 2, None, None]))
    return Batch(images, img_hw, jnp.asarray(gtb),
                 jnp.asarray(rng.randint(0, NC, (B, G)).astype(np.int32)),
                 jnp.asarray(np.tile(np.arange(G) < 2, (B, 1))),
                 gt_masks=jnp.asarray(gm.astype(np.float32)))


def test_point_rend_family_step():
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    model = PointRendRCNN(num_classes=NC, depth=18)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="point_rend", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    cfg.rcnn_num_proposals = 16
    cfg.rcnn_num_samples = 16
    batch = _tiny_batch()
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw,
                   method=PointRendRCNN.init_all)
    assert "coarse_head" in v["params"] and "point_head" in v["params"]
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("point_rend", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, batch)
    assert "loss_mask" in losses and "loss_point" in losses
    assert np.isfinite(float(losses["loss"]))


def test_sample_train_points_prefers_uncertain():
    """Importance sampling must pick the near-zero-logit (uncertain)
    column far more often than confident columns."""
    rng = jax.random.PRNGKey(0)
    M = 4
    coarse = np.full((M, COARSE_SIZE, COARSE_SIZE, NC), 8.0, np.float32)
    coarse[:, :, 3, :] = 0.01          # one uncertain column (x ~ 0.5)
    labels = jnp.zeros((M,), jnp.int32)
    pts = sample_train_points(rng, jnp.asarray(coarse), labels,
                              num_points=48, oversample_ratio=3,
                              importance_sample_ratio=0.75)
    assert pts.shape == (M, 48, 2)
    xs = np.asarray(pts[:, :36, 0])    # the importance-sampled 75%
    frac_near = ((xs > 3.0 / 7) & (xs < 4.0 / 7)).mean()
    assert frac_near > 0.35            # vs ~1/7 for uniform (bilinear
    # bleed spreads low logits into the neighbouring half-cells)


def test_point_targets_match_bitmap():
    rois = jnp.asarray([[0.0, 0.0, 32.0, 32.0]])
    gm = np.zeros((1, 16, 16), np.float32)
    gm[0, :, :4] = 1.0                 # left quarter (x < 16 px) is fg
    rel = jnp.asarray([[[0.25, 0.5], [0.75, 0.5]]])   # x=8px, x=24px
    t = point_targets(rois, rel, jnp.asarray(gm), mask_stride=4)
    np.testing.assert_allclose(np.asarray(t[0]), [1.0, 0.0], atol=1e-5)


def test_refine_masks_scatters_new_logits():
    model = PointRendRCNN(num_classes=NC, depth=18)
    B, HW, R = 1, 64, 3
    images = jnp.zeros((B, HW, HW, 3))
    img_hw = jnp.asarray([[HW, HW]], np.int32)
    v = model.init(jax.random.PRNGKey(0), images, img_hw,
                   method=PointRendRCNN.init_all)
    out = model.apply(v, images, img_hw)
    rois = jnp.asarray([[[2, 2, 30, 30], [8, 8, 40, 40], [0, 0, 64, 64]]],
                       jnp.float32)
    valid = jnp.ones((1, R), bool)
    labels = jnp.zeros((1, R), jnp.int32)
    coarse = jax.random.normal(jax.random.PRNGKey(1),
                               (R, COARSE_SIZE, COARSE_SIZE, NC))
    refined = refine_masks_test(
        lambda fi, cp: model.apply(v, fi, cp,
                                   method=PointRendRCNN.point_forward),
        [out.neck_feats[0][0]], rois, valid, labels, coarse)
    assert refined.shape == (R, 28, 28, NC)
    # the refinement must differ from plain bilinear upsampling
    up = jax.image.resize(coarse, (R, 28, 28, NC), method="bilinear")
    assert np.abs(np.asarray(refined) - np.asarray(up)).max() > 1e-4


def test_point_rend_eval_step():
    from dskd_tpu.eval.evaluator import make_eval_step

    model = PointRendRCNN(num_classes=NC, depth=18)
    B, HW = 1, 64
    images = jnp.zeros((B, HW, HW, 3))
    img_hw = jnp.asarray([[HW, HW]], np.int32)
    v = model.init(jax.random.PRNGKey(0), images, img_hw,
                   method=PointRendRCNN.init_all)
    step = make_eval_step(model, max_per_img=8, arch="point_rend")
    det = step(v, images, img_hw, jnp.ones((B, 4)))
    assert det.masks.shape == (B, 8, 28, 28)
    assert det.bboxes.shape == (B, 8, 4)


def test_simple_roi_align_p2_oracle():
    """SimpleRoIAlign(S) on P2 = bilinear sampling at the S x S RoI cell
    centers; numpy grid_sample(align_corners=False) oracle."""
    from dskd_tpu.models.point_rend import simple_roi_align_p2
    rng = np.random.RandomState(3)
    H = W = 16
    stride = 4
    feat = rng.randn(H, W, 2).astype(np.float32)
    rois = np.asarray([[2.0, 3.0, 30.0, 20.0], [0.0, 0.0, 64.0, 64.0]],
                      np.float32)
    S = 4
    out = np.asarray(simple_roi_align_p2(
        jnp.asarray(feat), jnp.asarray(rois), jnp.ones((2,), bool),
        out_size=S, stride=stride))

    def bilin(x, y):
        xs, ys = x - 0.5, y - 0.5
        x0, y0 = int(np.floor(xs)), int(np.floor(ys))
        tx, ty = xs - x0, ys - y0
        acc = np.zeros(2, np.float32)
        for dy, wy in ((0, 1 - ty), (1, ty)):
            for dx, wx in ((0, 1 - tx), (1, tx)):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < H and 0 <= xx < W:
                    acc += wy * wx * feat[yy, xx]
        return acc

    for r, (x1, y1, x2, y2) in enumerate(rois):
        for i in range(S):
            for j in range(S):
                px = (x1 + (j + 0.5) / S * (x2 - x1)) / stride
                py = (y1 + (i + 0.5) / S * (y2 - y1)) / stride
                np.testing.assert_allclose(out[r, i, j], bilin(px, py),
                                           rtol=1e-5, atol=1e-5)

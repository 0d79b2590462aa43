"""RepPoints: moment transform, point assigner, forward/loss/decode/step."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.reppoints import (RepPoints, RepPointsLossConfig,
                                       point_assign, points2bbox,
                                       reppoints_centers,
                                       reppoints_get_bboxes,
                                       reppoints_loss)

B, HW, NC = 2, 64, 6


def test_points2bbox_moment():
    """With moment=0 the pseudo box is mean +- std exactly (torch.std is
    unbiased, /(n-1))."""
    pts = np.zeros((1, 18), np.float32)
    pts[0, 0::2] = [0, 0, 0, 4, 4, 4, 8, 8, 8]       # y
    pts[0, 1::2] = [0, 4, 8, 0, 4, 8, 0, 4, 8]       # x
    box = np.asarray(points2bbox(jnp.asarray(pts), jnp.zeros(2)))[0]
    sd = np.std([0, 0, 0, 4, 4, 4, 8, 8, 8], ddof=1)
    np.testing.assert_allclose(box, [4 - sd, 4 - sd, 4 + sd, 4 + sd],
                               rtol=1e-5)


def test_point_assigner_levels():
    centers, strides, counts = reppoints_centers(
        [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)])
    # sqrt(area)=16 -> log2(16/4)=2 ... level index clamp(2-3+?) -> 0
    gt = jnp.asarray(np.array([[0, 0, 16, 16], [0, 0, 256, 256]],
                              np.float32))
    labels = jnp.asarray(np.array([1, 2], np.int32))
    valid = jnp.asarray(np.array([True, True]))
    assigned, pos, lab = point_assign(centers, strides, counts, gt,
                                      labels, valid, NC)
    assert int(pos.sum()) == 2
    idx = np.where(np.asarray(pos))[0]
    # the small gt lands on level 0 (first 64 cells); the big one higher
    level_of = np.concatenate([np.full(n, i) for i, n in enumerate(counts)])
    lvls = sorted(level_of[idx])
    assert lvls[0] == 0 and lvls[1] > 0


def test_point_assigner_torch_oracle():
    """Vectorized assigner == a loop restatement of the reference
    (point_assigner.py:88-121): per-gt nearest point on its level under
    the (w, h)-normalized metric, strict-< replacement across gts."""
    rng = np.random.RandomState(3)
    sizes = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
    centers, strides, counts = reppoints_centers(sizes)
    c_np = np.asarray(centers)
    pl = np.concatenate([np.full(n, i) for i, n in enumerate(counts)])
    for trial in range(5):
        G = 8
        xy = rng.rand(G, 2) * 40
        wh = np.exp(rng.randn(G, 2) * 1.5) * 12 + 1   # elongated boxes too
        gt = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        valid = rng.rand(G) > 0.2
        labels = rng.randint(0, NC, G).astype(np.int32)

        # reference restatement
        gw = np.maximum(gt[:, 2] - gt[:, 0], 1e-6)
        gh = np.maximum(gt[:, 3] - gt[:, 1], 1e-6)
        glvl = np.clip(np.floor(np.log2(np.sqrt(gw * gh) / 4)).astype(int)
                       - 3, 0, len(counts) - 1)
        exp_assigned = np.full(c_np.shape[0], -1, int)
        exp_dist = np.full(c_np.shape[0], np.inf)
        for g in range(G):
            if not valid[g]:
                continue
            m = pl == glvl[g]
            cx, cy = (gt[g, 0] + gt[g, 2]) / 2, (gt[g, 1] + gt[g, 3]) / 2
            d = np.sqrt(((c_np[m, 0] - cx) / gw[g]) ** 2
                        + ((c_np[m, 1] - cy) / gh[g]) ** 2)
            j = np.where(m)[0][np.argmin(d)]         # pos_num=1
            if d.min() < exp_dist[j]:
                exp_assigned[j] = g
                exp_dist[j] = d.min()

        assigned, pos, lab = point_assign(
            centers, strides, counts, jnp.asarray(gt),
            jnp.asarray(labels), jnp.asarray(valid), NC)
        np.testing.assert_array_equal(np.asarray(assigned), exp_assigned,
                                      err_msg=f"trial {trial}")
        exp_lab = np.where(exp_assigned >= 0,
                           labels[np.clip(exp_assigned, 0, G - 1)], NC)
        np.testing.assert_array_equal(np.asarray(lab), exp_lab)


def test_reppoints_forward_loss_decode_step():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, 3, 2).astype(np.float32) * 20
    wh = rng.rand(B, 3, 2).astype(np.float32) * 25 + 10
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, NC, (B, 3)).astype(np.int32))
    valid = jnp.asarray(np.tile(np.arange(3) < 2, (B, 1)))

    model = RepPoints(num_classes=NC, depth=18)
    v = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(v, images, img_hw)
    assert out.head.cls_scores[0].shape[-1] == NC
    assert out.head.pts_init[0].shape[-1] == 18
    assert out.moment.shape == (2,)

    losses = reppoints_loss(out.head, out.moment, gt, labels, valid,
                            RepPointsLossConfig(num_classes=NC))
    assert {"loss_cls", "loss_pts_init", "loss_pts_refine"} == set(losses)
    for k, x in losses.items():
        assert np.isfinite(float(x)), (k, float(x))

    d = reppoints_get_bboxes(out.head, out.moment, img_hw, score_thr=-1.0,
                             max_per_img=5)
    assert d["bboxes"].shape == (B, 5, 4)

    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="reppoints", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"],
                              v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("reppoints", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, Batch(images, img_hw, gt, labels, valid))
    assert np.isfinite(float(losses["loss"]))

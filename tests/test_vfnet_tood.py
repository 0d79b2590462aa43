"""VFNet + TOOD families: forward, star/side sampling semantics, TAL
assigner invariants, losses, decode, one train step each."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.tood import (TOOD, TOODLossConfig, _sample_sides,
                                  task_aligned_assign, tood_get_bboxes,
                                  tood_loss, tood_points)
from dskd_tpu.models.vfnet import (VFNet, VFNetLossConfig,
                                   star_dcn_offsets, vfnet_get_bboxes,
                                   vfnet_loss, vfnet_points)

B, HW, NC = 2, 64, 6


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, 3, 2).astype(np.float32) * 30
    wh = rng.rand(B, 3, 2).astype(np.float32) * 20 + 8
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, NC, (B, 3)).astype(np.int32))
    valid = jnp.asarray(np.tile(np.arange(3) < 2, (B, 1)))
    return images, img_hw, gt, labels, valid


def test_star_offsets_land_on_box():
    """Tap (0,0) must sample at (-t, -l) from the cell, tap (2,2) at
    (b, r) — verify the analytic grid subtraction."""
    ltrb = jnp.asarray(np.array([[[[8.0, 16.0, 24.0, 32.0]]]]))  # 1x1x1 map
    offs = np.asarray(star_dcn_offsets(ltrb, stride=8))[0, 0, 0]
    offs = offs.reshape(9, 2)
    d = np.array([8, 16, 24, 32]) * 0.1 / 8 + \
        np.array([8, 16, 24, 32]) * 0.9 / 8   # grad-mul mix = identity val
    l, t, r, b = d
    # absolute sampling point = tap base (i-1, j-1) + stored offset
    base = np.array([(i - 1, j - 1) for i in range(3) for j in range(3)],
                    np.float32)
    absolute = base + offs
    np.testing.assert_allclose(absolute[0], [-t, -l], rtol=1e-5)
    np.testing.assert_allclose(absolute[8], [b, r], rtol=1e-5)
    np.testing.assert_allclose(absolute[4], [0, 0], atol=1e-6)


def test_sample_sides_identity_and_shift():
    rng = np.random.RandomState(0)
    m = jnp.asarray(rng.rand(1, 4, 5, 4).astype(np.float32))
    zero = jnp.zeros((1, 4, 5, 8))
    np.testing.assert_allclose(np.asarray(_sample_sides(m, zero)),
                               np.asarray(m), rtol=1e-6)
    # integer shift of side 0 by +1 column
    off = np.zeros((1, 4, 5, 8), np.float32)
    off[..., 1] = 1.0                  # (dy, dx) for side 0 -> dx = 1
    got = np.asarray(_sample_sides(m, jnp.asarray(off)))
    np.testing.assert_allclose(got[0, :, :-1, 0],
                               np.asarray(m)[0, :, 1:, 0], rtol=1e-6)
    np.testing.assert_allclose(got[0, :, :, 1:], np.asarray(m)[0, :, :, 1:],
                               rtol=1e-6)


def test_tal_assigner_invariants():
    rng = np.random.RandomState(1)
    N, G = 50, 2
    points = jnp.asarray(
        np.stack([rng.rand(N) * 64, rng.rand(N) * 64], -1)
        .astype(np.float32))
    boxes = jnp.asarray(np.concatenate(
        [points - 5, points + 5], -1))
    scores = jnp.asarray(rng.rand(N, NC).astype(np.float32))
    gt = jnp.asarray(np.array([[0, 0, 32, 32], [32, 32, 64, 64]],
                              np.float32))
    labels = jnp.asarray(np.array([1, 3], np.int32))
    valid = jnp.asarray(np.array([True, True]))
    assigned, pos, lab, align, iou = task_aligned_assign(
        scores, boxes, points, gt, labels, valid, NC, topk=5)
    assert int(pos.sum()) <= 2 * 5
    # every positive's center is inside its assigned gt
    pts = np.asarray(points)[np.asarray(pos)]
    ag = np.asarray(assigned)[np.asarray(pos)]
    g = np.asarray(gt)[ag]
    assert ((pts[:, 0] > g[:, 0]) & (pts[:, 0] < g[:, 2])
            & (pts[:, 1] > g[:, 1]) & (pts[:, 1] < g[:, 3])).all()
    assert set(np.asarray(lab)[np.asarray(pos)]) <= {1, 3}
    assert (np.asarray(align)[np.asarray(pos)] > 0).all()


def _family_smoke(arch, model_cls):
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    images, img_hw, gt, labels, valid = _inputs()
    model = model_cls(num_classes=NC, depth=18)
    cfg = ExperimentConfig(model=ModelConfig(arch=arch, num_classes=NC),
                           distill=DistillFlags(cates_distill="",
                                                feats_distill=""))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    tx = make_optimizer(variables["params"], lambda i: 1e-4)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step(arch, model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, Batch(images, img_hw, gt, labels, valid))
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    return losses


def test_vfnet_forward_loss_step_decode():
    images, img_hw, gt, labels, valid = _inputs()
    model = VFNet(num_classes=NC, depth=18)
    v = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(v, images, img_hw)
    assert len(out.head.cls_scores) == 5
    assert out.head.bbox_preds[0].shape[-1] == 4
    # refined distances are positive multiples of the initial ones
    assert (np.asarray(out.head.bbox_preds_refine[0]) > 0).all()

    points, anchors, counts = vfnet_points(
        [c.shape[1:3] for c in out.head.cls_scores])
    losses = vfnet_loss(out.head, points, anchors, counts, gt, labels,
                        valid, VFNetLossConfig(num_classes=NC))
    assert {"loss_cls", "loss_bbox", "loss_bbox_rf"} == set(losses)
    d = vfnet_get_bboxes(out.head, points, img_hw, score_thr=-1.0,
                         max_per_img=5)
    assert d["bboxes"].shape == (B, 5, 4)
    smoke = _family_smoke("vfnet", VFNet)
    assert "loss_bbox_rf" in smoke


def test_tood_forward_loss_step_decode():
    images, img_hw, gt, labels, valid = _inputs()
    model = TOOD(num_classes=NC, depth=18)
    v = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(v, images, img_hw)
    # TOOD cls outputs are PROBABILITIES in (0, 1)
    s = np.asarray(out.head.cls_scores[0])
    assert (s > 0).all() and (s < 1).all()

    points, anchors, counts = tood_points(
        [c.shape[1:3] for c in out.head.cls_scores])
    for use_tal in (True, False):
        losses = tood_loss(out.head, points, anchors, counts, gt, labels,
                           valid, TOODLossConfig(num_classes=NC),
                           use_tal=use_tal)
        for k, val in losses.items():
            assert np.isfinite(float(val)), (use_tal, k)
    d = tood_get_bboxes(out.head, points, img_hw, score_thr=-1.0,
                        max_per_img=5)
    assert d["bboxes"].shape == (B, 5, 4)
    _family_smoke("tood", TOOD)

"""PAA: fixed-iteration GMM split, forward/loss/decode/step."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.paa import (PAA, PAALossConfig, gmm_split,
                                 paa_anchors, paa_get_bboxes, paa_loss)

B, HW, NC = 2, 64, 6


def test_gmm_split_separates_bimodal():
    rng = np.random.RandomState(0)
    lo = rng.normal(0.5, 0.05, 20)
    hi = rng.normal(5.0, 0.3, 25)
    scores = jnp.asarray(np.concatenate([lo, hi]).astype(np.float32))
    valid = jnp.ones((45,), bool)
    m = np.asarray(gmm_split(scores, valid))
    # separation scheme (c) (paa_head.py:389-400): positives are the
    # loss-sorted PREFIX up to the fg likelihood peak — a nonempty
    # subset of the low cluster; the high cluster contributes none
    assert m.any() and not m[20:].any()
    # prefix property: every positive's loss <= every non-positive's
    sc = np.asarray(scores)
    assert sc[m].max() <= sc[~m].min() + 1e-6
    # invalid entries never become positives
    valid2 = jnp.asarray(np.arange(45) < 10)
    m2 = np.asarray(gmm_split(scores, valid2))
    assert not m2[10:].any()


def test_paa_forward_loss_decode_step():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, 3, 2).astype(np.float32) * 20
    wh = rng.rand(B, 3, 2).astype(np.float32) * 25 + 10
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, NC, (B, 3)).astype(np.int32))
    valid = jnp.asarray(np.tile(np.arange(3) < 2, (B, 1)))

    model = PAA(num_classes=NC, depth=18)
    v = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(v, images, img_hw)
    assert out.head.iou_preds[0].shape[-1] == 1

    anchors, counts = paa_anchors(
        [c.shape[1:3] for c in out.head.cls_scores])
    losses = paa_loss(out.head, anchors, counts, gt, labels, valid,
                      PAALossConfig(num_classes=NC))
    assert {"loss_cls", "loss_bbox", "loss_iou"} == set(losses)
    for k, x in losses.items():
        assert np.isfinite(float(x)), (k, float(x))

    d = paa_get_bboxes(out.head, anchors, img_hw, score_thr=-1.0,
                       max_per_img=5)
    assert d["bboxes"].shape == (B, 5, 4)

    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="paa", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("paa", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, Batch(images, img_hw, gt, labels, valid))
    assert np.isfinite(float(losses["loss"]))


def test_lad_teacher_assignment():
    """LAD: the teacher's outputs drive the GMM assignment; identical
    teacher == plain PAA; a different teacher changes the losses."""
    from dskd_tpu.models.paa import paa_anchors, paa_loss

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, 3, 2).astype(np.float32) * 20
    wh = rng.rand(B, 3, 2).astype(np.float32) * 25 + 10
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, NC, (B, 3)).astype(np.int32))
    valid = jnp.asarray(np.tile(np.arange(3) < 2, (B, 1)))

    model = PAA(num_classes=NC, depth=18)
    v = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(v, images, img_hw)
    anchors, counts = paa_anchors(
        [c.shape[1:3] for c in out.head.cls_scores])
    cfg = PAALossConfig(num_classes=NC)

    base = paa_loss(out.head, anchors, counts, gt, labels, valid, cfg)
    same = paa_loss(out.head, anchors, counts, gt, labels, valid, cfg,
                    assign_out=out.head)
    np.testing.assert_allclose(float(base["loss_cls"]),
                               float(same["loss_cls"]), rtol=1e-6)

    v2 = model.init(jax.random.PRNGKey(5), images, img_hw)
    t_out = model.apply(v2, images, img_hw)
    lad = paa_loss(out.head, anchors, counts, gt, labels, valid, cfg,
                   assign_out=t_out.head)
    for k in lad:
        assert np.isfinite(float(lad[k])), k


def test_score_voting_weighted_average():
    import jax.numpy as jnp
    import numpy as np
    from dskd_tpu.models.paa import score_voting

    det = jnp.asarray([[10.0, 10.0, 20.0, 20.0]])
    labels = jnp.asarray([1])
    # two same-class candidates: the det itself + a shifted overlap;
    # one other-class-score-only candidate must not contribute
    cand = jnp.asarray([[10.0, 10.0, 20.0, 20.0],
                        [12.0, 12.0, 22.0, 22.0],
                        [10.0, 10.0, 20.0, 20.0]])
    probs = np.zeros((3, 3), np.float32)
    probs[0, 1] = 0.9
    probs[1, 1] = 0.9
    probs[2, 2] = 0.9          # wrong class
    voted = np.asarray(score_voting(det, labels, cand,
                                    jnp.asarray(probs)))
    # pulled toward the shifted candidate, but not past it
    assert 10.0 < voted[0, 0] < 12.0
    # same-score symmetric weights would land between the two
    import math
    w2 = math.exp(-((1 - 25.0 / 175.0) ** 2) / 0.025)
    exp_x = (0.9 * 10 + 0.9 * w2 * 12) / (0.9 + 0.9 * w2)
    np.testing.assert_allclose(voted[0, 0], exp_x, rtol=1e-4)


def test_paa_decode_with_voting_runs():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dskd_tpu.models.paa import PAA, paa_get_bboxes, paa_anchors

    model = PAA(num_classes=5, depth=18)
    images = jnp.zeros((1, 64, 64, 3))
    img_hw = jnp.asarray([[64, 64]], np.int32)
    v = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(v, images, img_hw)
    anchors, _ = paa_anchors([c.shape[1:3] for c in out.head.cls_scores])
    d = jax.jit(lambda o, a, hw: paa_get_bboxes(
        o, a, hw, max_per_img=10))(out.head, jnp.asarray(anchors), img_hw)
    assert d["bboxes"].shape == (1, 10, 4)
    assert np.all(np.isfinite(np.asarray(d["bboxes"])))

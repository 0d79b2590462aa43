"""PISA: IoU-HLR rank weights (torch-loop oracle) + CARL coupling."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.pisa import _rank_desc, carl_loss, isr_p_weights

NC = 5


def test_rank_desc_matches_argsort():
    rng = np.random.RandomState(0)
    vals = jnp.asarray(rng.rand(12).astype(np.float32))
    group = jnp.ones((12, 12), bool)
    valid = jnp.ones((12,), bool)
    got = np.asarray(_rank_desc(vals, group, valid))
    order = np.argsort(-np.asarray(vals), kind="stable")
    want = np.empty(12, np.int64)
    want[order] = np.arange(12)
    np.testing.assert_array_equal(got, want)


def test_isr_weights_rank_highest_iou_highest():
    """Within one class+gt, the positive whose prediction best overlaps
    its target must get the LARGEST importance weight (IoU-HLR rank 0)."""
    BN = 20
    rng = np.random.RandomState(1)
    anchors = np.tile([[0.0, 0.0, 20.0, 20.0]], (BN, 1)).astype(np.float32)
    tgt_deltas = np.zeros((BN, 4), np.float32)
    deltas = np.zeros((BN, 4), np.float32)
    deltas[1] = [0.0, 0.0, 0.0, 0.0]       # exact -> IoU 1
    deltas[2] = [0.5, 0.5, 0.0, 0.0]       # shifted -> lower IoU
    deltas[3] = [1.0, 1.0, 0.0, 0.0]       # worse
    pos = np.zeros(BN, bool)
    pos[[1, 2, 3]] = True
    labels = np.full(BN, NC, np.int32)
    labels[[1, 2, 3]] = 2
    gt = np.full(BN, -1, np.int32)
    gt[[1, 2, 3]] = 0
    cls = rng.randn(BN, NC).astype(np.float32)
    w = np.asarray(isr_p_weights(
        jnp.asarray(cls), jnp.asarray(deltas), jnp.asarray(anchors),
        jnp.asarray(labels), jnp.asarray(pos), jnp.asarray(gt),
        jnp.asarray(tgt_deltas), NC))
    assert w[1] > w[2] > w[3] > 0
    # negatives keep weight exactly 1
    np.testing.assert_allclose(w[pos == False], 1.0)  # noqa: E712
    # renormalization: weighted positive focal loss magnitude preserved
    from dskd_tpu.core import losses as L
    onehot = jax.nn.one_hot(jnp.clip(jnp.asarray(labels), 0, NC - 1), NC)
    per = np.asarray(L.sigmoid_focal_loss(
        jnp.asarray(cls), onehot, reduction="none").sum(-1))
    np.testing.assert_allclose((per * w)[pos].sum(), per[pos].sum(),
                               rtol=1e-4)


def test_carl_couples_classifier_to_regression():
    """CARL must produce a nonzero gradient on the CLS scores through
    the regression weighting."""
    rng = np.random.RandomState(2)
    BN = 16
    cls = jnp.asarray(rng.randn(BN, NC).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, NC, BN).astype(np.int32))
    pos = jnp.asarray(np.arange(BN) < 5)
    deltas = jnp.asarray(rng.randn(BN, 4).astype(np.float32))
    tgt = jnp.asarray(rng.randn(BN, 4).astype(np.float32))

    def f(c):
        return carl_loss(c, labels, pos, deltas, tgt, 5.0, NC)

    g = jax.grad(f)(cls)
    assert float(jnp.abs(g[:5]).sum()) > 0
    assert float(jnp.abs(g[5:]).sum()) == 0   # negatives out of the loss


def test_pisa_retina_family_step():
    from dskd_tpu.models.retinanet import RetinaNet
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    rng = np.random.RandomState(0)
    B, HW, G = 1, 64, 3
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, G, 2).astype(np.float32) * 20
    wh = rng.rand(B, G, 2).astype(np.float32) * 25 + 10
    batch = Batch(images, img_hw,
                  jnp.asarray(np.concatenate([xy, xy + wh], -1)),
                  jnp.asarray(rng.randint(0, NC, (B, G)).astype(np.int32)),
                  jnp.asarray(np.tile(np.arange(G) < 2, (B, 1))))
    model = RetinaNet(num_classes=NC, depth=18)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="pisa_retinanet", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw)
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("pisa_retinanet", model, cfg,
                                  num_prev=0, has_teacher=False,
                                  use_dropout=False)
    _, losses = step(state, batch)
    assert "loss_carl" in losses
    assert np.isfinite(float(losses["loss"]))


def test_pisa_ssd_family_step():
    from dskd_tpu.models.ssd import SSD
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    rng = np.random.RandomState(3)
    B, HW, G = 1, 300, 3
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, G, 2).astype(np.float32) * 100
    wh = rng.rand(B, G, 2).astype(np.float32) * 120 + 40
    batch = Batch(images, img_hw,
                  jnp.asarray(np.concatenate([xy, xy + wh], -1)),
                  jnp.asarray(rng.randint(0, NC, (B, G)).astype(np.int32)),
                  jnp.asarray(np.tile(np.arange(G) < 2, (B, 1))))
    model = SSD(num_classes=NC)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="pisa_ssd", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw)
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("pisa_ssd", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, batch)
    assert "loss_carl" in losses
    assert np.isfinite(float(losses["loss"]))


def _frcnn_batch(rng_seed=5):
    from dskd_tpu.train.step import Batch
    rng = np.random.RandomState(rng_seed)
    B, HW, G = 1, 64, 3
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, G, 2).astype(np.float32) * 20
    wh = rng.rand(B, G, 2).astype(np.float32) * 25 + 10
    return Batch(images, img_hw,
                 jnp.asarray(np.concatenate([xy, xy + wh], -1)),
                 jnp.asarray(rng.randint(0, NC, (B, G)).astype(np.int32)),
                 jnp.asarray(np.tile(np.arange(G) < 2, (B, 1))))


def _frcnn_step(arch):
    from dskd_tpu.models.faster_rcnn import FasterRCNN
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    batch = _frcnn_batch()
    model = FasterRCNN(num_classes=NC, depth=18)
    cfg = ExperimentConfig(
        model=ModelConfig(arch=arch, num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    cfg.rcnn_num_proposals = 16
    cfg.rcnn_num_samples = 16
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw,
                   method=FasterRCNN.init_all)
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step(arch, model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    return step(state, batch)[1]


def test_pisa_faster_rcnn_step():
    losses = _frcnn_step("pisa_faster_rcnn")
    assert "rcnn_loss_carl" in losses
    assert np.isfinite(float(losses["loss"]))


def test_dynamic_rcnn_step():
    losses = _frcnn_step("dynamic_rcnn")
    assert np.isfinite(float(losses["loss"]))
    # differs from the static-threshold loss (the dynamic IoU/beta bite)
    base = _frcnn_step("faster_rcnn")
    assert float(losses["rcnn_loss_bbox"]) != float(base["rcnn_loss_bbox"])


def test_isr_weights_match_reference_loop():
    """Vectorized ranks vs a python re-statement of isr_p's two-level
    sort (pisa_loss.py:84-103) on random positives."""
    from dskd_tpu.core import losses as L
    from dskd_tpu.core.anchors import delta2bbox
    from dskd_tpu.core.boxes import bbox_overlaps

    rng = np.random.RandomState(7)
    BN, k, bias = 40, 2.0, 0.0
    anchors = np.stack([rng.rand(BN) * 50, rng.rand(BN) * 50,
                        50 + rng.rand(BN) * 50, 50 + rng.rand(BN) * 50],
                       -1).astype(np.float32)
    deltas = (rng.randn(BN, 4) * 0.2).astype(np.float32)
    tgt_deltas = (rng.randn(BN, 4) * 0.2).astype(np.float32)
    pos = rng.rand(BN) > 0.5
    labels = np.where(pos, rng.randint(0, 3, BN), NC).astype(np.int32)
    gt = np.where(pos, rng.randint(0, 4, BN), -1).astype(np.int32)
    cls = rng.randn(BN, NC).astype(np.float32)

    from dskd_tpu.models.pisa import isr_p_weights
    got = np.asarray(isr_p_weights(
        jnp.asarray(cls), jnp.asarray(deltas), jnp.asarray(anchors),
        jnp.asarray(labels), jnp.asarray(pos), jnp.asarray(gt),
        jnp.asarray(tgt_deltas), NC))

    # reference loop
    pb = np.asarray(delta2bbox(jnp.asarray(anchors), jnp.asarray(deltas)))
    tb = np.asarray(delta2bbox(jnp.asarray(anchors),
                               jnp.asarray(tgt_deltas)))
    ious = np.asarray(bbox_overlaps(jnp.asarray(pb), jnp.asarray(tb),
                                    mode="iou", is_aligned=True)).copy()
    pidx = np.where(pos)[0]
    plab, pgt, pious = labels[pidx], gt[pidx], ious[pidx]
    max_l = max(np.bincount(plab).max(), 1)
    imp = np.ones(len(pidx))
    iou2 = pious.copy()
    for lab in np.unique(plab):
        li = np.where(plab == lab)[0]
        for t in np.unique(pgt[li]):
            ti = li[pgt[li] == t]
            order = np.argsort(-iou2[ti], kind="stable")
            rank = np.empty(len(ti), int)
            rank[order] = np.arange(len(ti))
            iou2[ti] += max_l - rank
        order = np.argsort(-iou2[li], kind="stable")
        rank = np.empty(len(li), int)
        rank[order] = np.arange(len(li))
        imp[li] = (bias + ((max_l - rank) / max_l) * (1 - bias)) ** k
    onehot = jax.nn.one_hot(jnp.clip(jnp.asarray(plab), 0, NC - 1), NC)
    per = np.asarray(L.sigmoid_focal_loss(
        jnp.asarray(cls[pidx]), onehot, reduction="none").sum(-1))
    imp *= per.sum() / max((per * imp).sum(), 1e-12)
    want = np.ones(BN)
    want[pidx] = imp
    np.testing.assert_allclose(got, want, rtol=1e-4)

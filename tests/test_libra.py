"""Libra R-CNN: balanced L1 algebra, IoU-balanced sampler, family step."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.core.losses import balanced_l1_loss, smooth_l1_loss
from dskd_tpu.core.max_iou_assigner import iou_balanced_sample


def test_balanced_l1_properties():
    d = jnp.linspace(0.0, 3.0, 31)
    zero = jnp.zeros_like(d)
    l = np.asarray(balanced_l1_loss(d, zero, reduction="none"))
    assert l[0] == 0.0
    assert (np.diff(l) > 0).all()                   # monotone
    # continuous at the knee (beta=1)
    eps_l = float(balanced_l1_loss(jnp.array([0.999]), jnp.zeros(1),
                                   reduction="none")[0])
    eps_r = float(balanced_l1_loss(jnp.array([1.001]), jnp.zeros(1),
                                   reduction="none")[0])
    assert abs(eps_l - eps_r) < 1e-2
    # promotes inliers vs smooth-l1 at small |d| (steeper gradient)
    g_bal = jax.grad(lambda x: balanced_l1_loss(x, jnp.zeros(1),
                                                reduction="sum"))(
        jnp.array([0.1]))
    g_sl1 = jax.grad(lambda x: smooth_l1_loss(x, jnp.zeros(1),
                                              reduction="sum"))(
        jnp.array([0.1]))
    assert float(g_bal[0]) > float(g_sl1[0])


def test_iou_balanced_sampler_stratifies():
    rng = np.random.RandomState(0)
    N = 300
    assigned = np.full((N,), -1, np.int32)
    assigned[:10] = 0                          # 10 positives
    ious = np.zeros((N,), np.float32)
    # negatives: 95 easy (iou~0.05), 95 medium (~0.25), 100 hard (~0.45)
    ious[10:105] = 0.05
    ious[105:200] = 0.25
    ious[200:] = 0.45
    s = iou_balanced_sample(jax.random.PRNGKey(0), jnp.asarray(assigned),
                            jnp.asarray(ious), 120, 0.25)
    neg = np.asarray(s.neg_idx)[np.asarray(s.neg_valid)]
    bins = np.digitize(ious[neg], [1/6, 2/6 + 1e-6])
    counts = np.bincount(bins, minlength=3)
    # roughly even across the three bins (quota 30 each)
    assert counts.min() >= 25, counts
    assert len(neg) == 90


def test_libra_family_step():
    from dskd_tpu.models.faster_rcnn import FasterRCNN
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

    model = FasterRCNN(num_classes=NC, depth=18, use_bfp=True)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="libra_faster_rcnn", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    cfg.rcnn_num_proposals = 16
    cfg.rcnn_num_samples = 16
    v = model.init(jax.random.PRNGKey(0), images, img_hw,
                   method=FasterRCNN.init_all)
    assert "bfp" in v["params"]
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("libra_faster_rcnn", model, cfg,
                                  num_prev=0, has_teacher=False,
                                  use_dropout=False)
    _, losses = step(state, Batch(images, img_hw, gt, labels, valid))
    assert np.isfinite(float(losses["loss"]))


def test_double_head_rcnn_step():
    """Double-Head ROI: fc cls + conv reg branches, one family step."""
    from dskd_tpu.models.faster_rcnn import DoubleBBoxHead, FasterRCNN
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    head = DoubleBBoxHead(num_classes=5, fc_channels=64, conv_channels=64)
    # input = channel-concat of [cls pool | 1.3x-scaled reg pool]
    feats = jnp.zeros((3, 7, 7, 64))
    hv = head.init(jax.random.PRNGKey(0), feats)
    cls, reg = head.apply(hv, feats)
    assert cls.shape == (3, 6) and reg.shape == (3, 20)
    # BasicResBlock + Bottlenecks with trained BN (double_bbox_head.py)
    assert "res_conv1" in hv["params"] and "b0_conv1" in hv["params"]
    assert "cls_fc0" in hv["params"] and "res_bn1" in hv["batch_stats"]
    (_, _), mut = head.apply(hv, jnp.ones((3, 7, 7, 64)), True,
                             mutable=["batch_stats"])
    moved = jax.tree_util.tree_reduce(
        lambda a, b: a + float(np.abs(np.asarray(b)).sum()),
        mut["batch_stats"], 0.0)
    assert moved > 0.0    # train=True updates the BN running stats

    NC, HW, B = 6, 64, 1
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, 3, 2).astype(np.float32) * 20
    wh = rng.rand(B, 3, 2).astype(np.float32) * 25 + 10
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, NC, (B, 3)).astype(np.int32))
    valid = jnp.asarray(np.tile(np.arange(3) < 2, (B, 1)))

    model = FasterRCNN(num_classes=NC, depth=18, double_head=True)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="double_head_rcnn", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    cfg.rcnn_num_proposals = 16
    cfg.rcnn_num_samples = 16
    v = model.init(jax.random.PRNGKey(0), images, img_hw,
                   method=FasterRCNN.init_all)
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("double_head_rcnn", model, cfg,
                                  num_prev=0, has_teacher=False,
                                  use_dropout=False)
    _, losses = step(state, Batch(images, img_hw, gt, labels, valid))
    assert np.isfinite(float(losses["loss"]))


def test_fast_rcnn_no_rpn_step():
    """Fast R-CNN: no RPN params; trains the ROI head on external
    (here GT-jittered stand-in) proposals."""
    from dskd_tpu.models.faster_rcnn import FasterRCNN
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

    model = FasterRCNN(num_classes=NC, depth=18, with_rpn=False)
    v = model.init(jax.random.PRNGKey(0), images, img_hw,
                   method=FasterRCNN.init_all)
    assert "rpn_head" not in v["params"]
    cfg = ExperimentConfig(
        model=ModelConfig(arch="fast_rcnn", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    cfg.rcnn_num_proposals = 12
    cfg.rcnn_num_samples = 16
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("fast_rcnn", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, Batch(images, img_hw, gt, labels, valid))
    assert np.isfinite(float(losses["loss"]))

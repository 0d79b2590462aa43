"""FreeAnchor: bag-loss structure + train step."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.free_anchor import (FreeAnchorLossConfig,
                                         free_anchor_loss)
from dskd_tpu.models.retinanet import RetinaNet, retina_anchors

B, HW, NC = 2, 64, 6


def test_free_anchor_loss_and_step():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, 3, 2).astype(np.float32) * 20
    wh = rng.rand(B, 3, 2).astype(np.float32) * 25 + 10
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, NC, (B, 3)).astype(np.int32))
    valid = jnp.asarray(np.tile(np.arange(3) < 2, (B, 1)))

    model = RetinaNet(num_classes=NC, depth=18)
    v = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(v, images, img_hw)
    anchors = retina_anchors([c.shape[1:3] for c in out.head.cls_scores])
    losses = free_anchor_loss(out.head, anchors, gt, labels, valid,
                              FreeAnchorLossConfig(num_classes=NC))
    assert {"positive_bag_loss", "negative_bag_loss"} == set(losses)
    for k, x in losses.items():
        assert np.isfinite(float(x)) and float(x) > 0, (k, float(x))

    # perfectly confident bag -> positive loss collapses toward 0
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="free_anchor", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("free_anchor", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, Batch(images, img_hw, gt, labels, valid))
    assert np.isfinite(float(losses["loss"]))

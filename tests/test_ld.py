"""LD family: the localization-distillation KL and its gradient flow."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.gfl import GFL
from dskd_tpu.models.gfl_head import GFLLossConfig
from dskd_tpu.models.ld import LDLossConfig, ld_loss

B, HW, NC = 2, 64, 6


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, 3, 2).astype(np.float32) * 20
    wh = rng.rand(B, 3, 2).astype(np.float32) * 25 + 10
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, NC, (B, 3)).astype(np.int32))
    valid = jnp.asarray(np.tile(np.arange(3) < 2, (B, 1)))
    return images, img_hw, gt, labels, valid


def test_ld_loss_and_self_distill_zero():
    images, img_hw, gt, labels, valid = _inputs()
    model = GFL(num_classes=NC, depth=18)
    v = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(v, images, img_hw)
    cfg = LDLossConfig(gfl=GFLLossConfig(num_classes=NC))

    # teacher == student: the KL term vanishes (distribution identity)
    losses = ld_loss(out.head, out.head, gt, labels, valid, cfg)
    assert "loss_ld" in losses
    assert abs(float(losses["loss_ld"])) < 1e-5

    # a DIFFERENT teacher produces a positive LD loss and student grads
    v2 = model.init(jax.random.PRNGKey(7), images, img_hw)
    t_out = model.apply(v2, images, img_hw)
    losses2 = ld_loss(out.head, t_out.head, gt, labels, valid, cfg)
    assert float(losses2["loss_ld"]) > 0


def test_ld_family_train_step():
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    images, img_hw, gt, labels, valid = _inputs(1)
    model = GFL(num_classes=NC, depth=18)
    cfg = ExperimentConfig(model=ModelConfig(arch="ld", num_classes=NC),
                           distill=DistillFlags(cates_distill="hard",
                                                feats_distill=""))
    v = model.init(jax.random.PRNGKey(0), images, img_hw)
    teacher = jax.tree.map(
        jnp.copy, dict(model.init(jax.random.PRNGKey(9), images, img_hw)))
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("ld", model, cfg, num_prev=0,
                                  has_teacher=True, use_dropout=False)
    _, losses = step(state, Batch(images, img_hw, gt, labels, valid),
                     teacher)
    assert "loss_ld" in losses
    assert np.isfinite(float(losses["loss"]))


def test_ld_deeper_teacher_r50_into_r18_student():
    """configs/ld recipe shape: r18 student distilled from a DEEPER
    teacher — the teacher runs through its own module/params
    (ModelConfig.teacher_depth), not the student's."""
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.incremental import build_teacher_model
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    images, img_hw, gt, labels, valid = _inputs(1)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="ld", num_classes=NC, depth=18,
                          teacher_depth=50),
        distill=DistillFlags(cates_distill="hard", feats_distill=""))
    model = GFL(num_classes=NC, depth=18)
    t_model = build_teacher_model(cfg)
    assert t_model.depth == 50
    v = model.init(jax.random.PRNGKey(0), images, img_hw)
    tv = jax.tree.map(
        jnp.copy, dict(t_model.init(jax.random.PRNGKey(9), images,
                                    img_hw)))
    # the teacher's backbone really is deeper (bottleneck params)
    assert "layer1_block0" in tv["params"]["backbone"]
    assert tv["params"]["backbone"]["layer1_block0"]["conv3"][
        "kernel"].shape[-1] == 256
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("ld", model, cfg, num_prev=0,
                                  has_teacher=True, use_dropout=False)
    _, losses = step(state, Batch(images, img_hw, gt, labels, valid), tv)
    assert "loss_ld" in losses
    assert np.isfinite(float(losses["loss"]))

"""DETR family trains WITH dropout (reference detr_r50_8x2_150e_coco.py:
dropout=0.1 in every attention/FFN; round-2 review found the family step
applied the model deterministically regardless of cfg.train.use_dropout)."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.detr import DETR
from dskd_tpu.train.family import make_family_train_step
from dskd_tpu.train.optim import make_optimizer
from dskd_tpu.train.state import TrainState
from dskd_tpu.train.step import Batch
from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                   ModelConfig)


def _setup(use_dropout):
    model = DETR(num_classes=6, num_query=8, num_encoder_layers=1,
                 num_decoder_layers=1, depth=18, dropout=0.1)
    cfg = ExperimentConfig(model=ModelConfig(arch="detr", num_classes=6),
                           distill=DistillFlags())
    rng = np.random.RandomState(0)
    B, H, W = 2, 64, 64
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.1)
    img_hw = jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, 3, 2).astype(np.float32) * 30
    wh = rng.rand(B, 3, 2).astype(np.float32) * 20 + 5
    batch = Batch(images, img_hw,
                  jnp.asarray(np.concatenate([xy, xy + wh], -1)),
                  jnp.asarray(rng.randint(0, 6, (B, 3)).astype(np.int32)),
                  jnp.asarray(np.tile(np.arange(3) < 2, (B, 1))))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    tx = make_optimizer(variables["params"], lambda i: 1e-4)
    step = make_family_train_step("detr", model, cfg, num_prev=0,
                                  has_teacher=False,
                                  use_dropout=use_dropout)
    return variables, tx, batch, step


def _loss_with_rng(variables, tx, batch, step, seed):
    # fresh buffers per run: the jitted step donates state
    state = TrainState.create(
        jax.tree.map(jnp.copy, variables["params"]),
        jax.tree.map(jnp.copy, variables.get("batch_stats", {})), tx,
        jax.random.PRNGKey(seed))
    _, losses = step(state, batch)
    return float(losses["loss"])


def test_detr_dropout_perturbs_train_loss():
    variables, tx, batch, step = _setup(use_dropout=True)
    l1 = _loss_with_rng(variables, tx, batch, step, 1)
    l2 = _loss_with_rng(variables, tx, batch, step, 2)
    assert np.isfinite(l1) and np.isfinite(l2)
    assert abs(l1 - l2) > 1e-6, "dropout on: different rngs must differ"


def test_detr_no_dropout_is_deterministic():
    variables, tx, batch, step = _setup(use_dropout=False)
    l1 = _loss_with_rng(variables, tx, batch, step, 1)
    l2 = _loss_with_rng(variables, tx, batch, step, 2)
    assert l1 == l2, "dropout off: rng must not matter"

"""GHM-C / GHM-R losses vs a torch loop oracle (losses/ghm_loss.py).

The oracle re-states the reference's per-bin python loop directly
(including the momentum EMA update order and the occupied-bin
normalization); the framework's searchsorted+bincount formulation must
match it bitwise-ish over random cases and over multi-step EMA chains.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dskd_tpu.core.losses import ghm_c_loss, ghm_r_loss


def torch_ghm_c(pred, target, label_weight, bins, momentum, acc_sum):
    edges = torch.arange(bins + 1).float() / bins
    edges[-1] += 1e-6
    weights = torch.zeros_like(pred)
    g = torch.abs(pred.sigmoid().detach() - target)
    valid = label_weight > 0
    tot = max(valid.float().sum().item(), 1.0)
    n = 0
    acc_sum = acc_sum.clone()
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = inds.sum().item()
        if num_in_bin > 0:
            if momentum > 0:
                acc_sum[i] = momentum * acc_sum[i] \
                    + (1 - momentum) * num_in_bin
                weights[inds] = tot / acc_sum[i]
            else:
                weights[inds] = tot / num_in_bin
            n += 1
    if n > 0:
        weights = weights / n
    loss = F.binary_cross_entropy_with_logits(pred, target, reduction="none")
    loss = (loss * weights).sum() / (tot + np.finfo(np.float32).eps)
    return loss, acc_sum


def torch_ghm_r(pred, target, label_weight, mu, bins, momentum, acc_sum):
    edges = torch.arange(bins + 1).float() / bins
    edges[-1] = 1e3
    diff = pred - target
    loss = torch.sqrt(diff * diff + mu * mu) - mu
    g = torch.abs(diff / torch.sqrt(mu * mu + diff * diff)).detach()
    weights = torch.zeros_like(g)
    valid = label_weight > 0
    tot = max(label_weight.float().sum().item(), 1.0)
    n = 0
    acc_sum = acc_sum.clone()
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = inds.sum().item()
        if num_in_bin > 0:
            n += 1
            if momentum > 0:
                acc_sum[i] = momentum * acc_sum[i] \
                    + (1 - momentum) * num_in_bin
                weights[inds] = tot / acc_sum[i]
            else:
                weights[inds] = tot / num_in_bin
    if n > 0:
        weights /= n
    loss = (loss * weights).sum() / (tot + np.finfo(np.float32).eps)
    return loss, acc_sum


@pytest.mark.parametrize("momentum", [0.0, 0.75])
def test_ghm_c_matches_torch(momentum):
    rng = np.random.RandomState(0)
    bins = 7
    acc_j = None
    acc_t = torch.zeros(bins)
    for case in range(4):
        pred = rng.randn(40, 5).astype(np.float32) * 2
        target = (rng.rand(40, 5) < 0.2).astype(np.float32)
        lw = (rng.rand(40, 5) < 0.8).astype(np.float32)
        ref, acc_t = torch_ghm_c(
            torch.from_numpy(pred), torch.from_numpy(target),
            torch.from_numpy(lw), bins, momentum, acc_t)
        got, acc_j = ghm_c_loss(pred, target, lw, bins=bins,
                                momentum=momentum, acc_sum=acc_j)
        np.testing.assert_allclose(float(got), float(ref), rtol=2e-5,
                                   err_msg=f"case {case}")
        np.testing.assert_allclose(np.asarray(acc_j), acc_t.numpy(),
                                   rtol=2e-5)


@pytest.mark.parametrize("momentum", [0.0, 0.7])
def test_ghm_r_matches_torch(momentum):
    rng = np.random.RandomState(1)
    bins = 10
    mu = 0.02
    acc_j = None
    acc_t = torch.zeros(bins)
    for case in range(4):
        pred = rng.randn(60, 4).astype(np.float32)
        target = rng.randn(60, 4).astype(np.float32)
        lw = (rng.rand(60, 4) < 0.3).astype(np.float32)
        ref, acc_t = torch_ghm_r(
            torch.from_numpy(pred), torch.from_numpy(target),
            torch.from_numpy(lw), mu, bins, momentum, acc_t)
        got, acc_j = ghm_r_loss(pred, target, lw, mu=mu, bins=bins,
                                momentum=momentum, acc_sum=acc_j)
        np.testing.assert_allclose(float(got), float(ref), rtol=2e-5,
                                   err_msg=f"case {case}")
        np.testing.assert_allclose(np.asarray(acc_j), acc_t.numpy(),
                                   rtol=2e-5)


def test_ghm_c_all_invalid_is_finite():
    pred = np.zeros((8, 3), np.float32)
    target = np.zeros((8, 3), np.float32)
    lw = np.zeros((8, 3), np.float32)
    loss, _ = ghm_c_loss(pred, target, lw)
    assert np.isfinite(float(loss)) and float(loss) == 0.0


def test_ghm_retinanet_ema_persists_across_steps():
    """retinanet_ghm train steps thread the GHM EMA bin counts through
    batch_stats: two steps must each update acc_sum (momentum > 0), and
    the second step must start from the first's state."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.incremental import build_model, init_variables
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.schedule import step_lr_schedule
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import load_config

    cfg = load_config("configs/retinanet_ghm_r50_1x.py")
    cfg.model = dataclasses.replace(cfg.model, depth=18, num_classes=6)
    cfg.data = dataclasses.replace(cfg.data, bucket=(64, 64),
                                   img_scale=(64, 64), max_gt=4,
                                   aspect_buckets=None, multi_scales=None)
    model = build_model(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    assert "ghm_acc_c" in variables["batch_stats"]
    assert variables["batch_stats"]["ghm_acc_c"].shape == (30,)
    assert variables["batch_stats"]["ghm_acc_r"].shape == (10,)

    rng = np.random.RandomState(3)
    B, H, W = 2, 64, 64
    xy = rng.rand(B, 4, 2).astype(np.float32) * 30
    wh = rng.rand(B, 4, 2).astype(np.float32) * 20 + 6
    batch = Batch(
        jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.1),
        jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32)),
        jnp.asarray(np.concatenate([xy, xy + wh], -1)),
        jnp.asarray(rng.randint(0, 6, (B, 4)).astype(np.int32)),
        jnp.asarray(np.tile(np.arange(4) < 2, (B, 1))))

    step = make_family_train_step("retinanet_ghm", model, cfg,
                                  num_prev=1, has_teacher=False,
                                  use_dropout=False)
    tx = make_optimizer(variables["params"],
                        step_lr_schedule(1e-4, iters_per_epoch=10))
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    acc0 = np.zeros(30, np.float32)
    s1, l1 = step(state, batch, None)
    acc1 = np.asarray(s1.batch_stats["ghm_acc_c"]).copy()
    accr1 = np.asarray(s1.batch_stats["ghm_acc_r"]).copy()
    s2, l2 = step(s1, batch, None)
    acc2 = np.asarray(s2.batch_stats["ghm_acc_c"])
    assert np.isfinite(float(l1["loss"])) and np.isfinite(float(l2["loss"]))
    assert float(l1["loss_cls"]) > 0 and float(l1["loss_bbox"]) > 0
    # step 1 moved the EMA off zero, step 2 moved it again from step 1's
    assert np.abs(acc1 - acc0).sum() > 0
    assert np.abs(acc2 - acc1).sum() > 0
    assert accr1.sum() > 0
    # (the EMA arithmetic itself is pinned by the torch-oracle chains
    # above; the cross-step threading is what's under test here)


def test_ghm_grad_flows():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(2)
    pred = rng.randn(20, 4).astype(np.float32)
    target = rng.randn(20, 4).astype(np.float32)
    lw = np.ones((20, 4), np.float32)

    gr = jax.grad(lambda p: ghm_r_loss(jnp.asarray(p), target, lw)[0])(pred)
    assert np.isfinite(np.asarray(gr)).all()
    assert np.abs(np.asarray(gr)).sum() > 0


def test_ghm_effb_sepbn_stats_both_update():
    """Regression: retinanet_ghm + an effb backbone runs the SepBN head
    AND the GHM EMA — one train step must update BOTH the BN running
    stats (from the mutable apply) and the GHM bin counts; the ghm
    branch previously rebuilt batch_stats from the pre-step variables,
    freezing every BN at init."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.incremental import build_model, init_variables
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.schedule import step_lr_schedule
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import load_config

    cfg = load_config("configs/retinanet_ghm_r50_1x.py")
    cfg.model = dataclasses.replace(cfg.model, num_classes=6,
                                    backbone="effb0")
    cfg.data = dataclasses.replace(cfg.data, bucket=(64, 64),
                                   img_scale=(64, 64), max_gt=4,
                                   aspect_buckets=None, multi_scales=None)
    model = build_model(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))

    rng = np.random.RandomState(3)
    B, H, W = 2, 64, 64
    xy = rng.rand(B, 4, 2).astype(np.float32) * 30
    wh = rng.rand(B, 4, 2).astype(np.float32) * 20 + 6
    batch = Batch(
        jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.1),
        jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32)),
        jnp.asarray(np.concatenate([xy, xy + wh], -1)),
        jnp.asarray(rng.randint(0, 6, (B, 4)).astype(np.int32)),
        jnp.asarray(np.tile(np.arange(4) < 2, (B, 1))))

    step = make_family_train_step("retinanet_ghm", model, cfg,
                                  num_prev=1, has_teacher=False,
                                  use_dropout=False)
    tx = make_optimizer(variables["params"],
                        step_lr_schedule(1e-4, iters_per_epoch=10))
    bs0 = jax.tree.map(lambda x: np.asarray(x).copy(),
                       dict(variables.get("batch_stats", {})))
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    s1, l1 = step(state, batch, None)
    assert np.isfinite(float(l1["loss"]))
    # GHM EMAs moved
    assert np.abs(np.asarray(s1.batch_stats["ghm_acc_c"])
                  - bs0["ghm_acc_c"]).sum() > 0
    # and so did the BN running stats (any non-GHM leaf)
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        {k: v for k, v in dict(s1.batch_stats).items()
         if not k.startswith("ghm_")},
        {k: v for k, v in bs0.items() if not k.startswith("ghm_")})
    total = max(jax.tree.leaves(moved) or [0.0])
    assert total > 0, "BN running stats froze at init"

"""SeesawLoss vs a torch oracle (losses/seesaw_loss.py) + the
mask_rcnn_seesaw cum-sample state threading."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dskd_tpu.core.losses import seesaw_ce_loss


def torch_seesaw_ce(cls_score, labels, cum_samples, num_classes, p, q, eps):
    """Direct re-statement of seesaw_ce_loss (seesaw_loss.py:12-78),
    called on positive rows only as SeesawLoss.forward does."""
    onehot = F.one_hot(labels, num_classes)
    seesaw_weights = cls_score.new_ones(onehot.size())
    if p > 0:
        sample_ratio_matrix = cum_samples[None, :].clamp(
            min=1) / cum_samples[:, None].clamp(min=1)
        index = (sample_ratio_matrix < 1.0).float()
        sample_weights = sample_ratio_matrix.pow(p) * index + (1 - index)
        seesaw_weights = seesaw_weights * sample_weights[labels.long(), :]
    if q > 0:
        scores = F.softmax(cls_score.detach(), dim=1)
        self_scores = scores[
            torch.arange(0, len(scores)).long(), labels.long()]
        score_matrix = scores / self_scores[:, None].clamp(min=eps)
        index = (score_matrix > 1.0).float()
        compensation = score_matrix.pow(q) * index + (1 - index)
        seesaw_weights = seesaw_weights * compensation
    cls_score = cls_score + (seesaw_weights.log() * (1 - onehot))
    return F.cross_entropy(cls_score, labels, reduction="mean")


@pytest.mark.parametrize("p,q", [(0.8, 2.0), (0.0, 2.0), (0.8, 0.0)])
def test_seesaw_ce_matches_torch(p, q):
    rng = np.random.RandomState(0)
    C, N = 9, 40
    logits = rng.randn(N, C).astype(np.float32) * 2
    labels = rng.randint(0, C, N).astype(np.int32)
    # long-tail counts
    cum = (rng.rand(C) * 1000 + 1).astype(np.float32)
    ref = torch_seesaw_ce(torch.from_numpy(logits),
                          torch.from_numpy(labels.astype(np.int64)),
                          torch.from_numpy(cum), C, p, q, 1e-2)
    # static-shape framework call: all rows positive, weight 1
    got = seesaw_ce_loss(logits, labels, cum, C, p=p, q=q, eps=1e-2,
                         weight=np.ones(N, np.float32),
                         avg_factor=float(N))
    np.testing.assert_allclose(float(got), float(ref), rtol=3e-5)


def test_seesaw_padded_rows_are_neutral():
    """Background/padded rows (weight 0) must not change the loss even
    though they flow through the static-shape computation."""
    rng = np.random.RandomState(1)
    C, N = 6, 16
    logits = rng.randn(N, C).astype(np.float32)
    labels = rng.randint(0, C, N).astype(np.int32)
    cum = (rng.rand(C) * 100 + 1).astype(np.float32)
    w = np.ones(N, np.float32)
    base = seesaw_ce_loss(logits, labels, cum, C, weight=w,
                          avg_factor=float(N))
    # append garbage rows with out-of-range labels and zero weight
    logits2 = np.concatenate([logits, rng.randn(8, C).astype(np.float32)])
    labels2 = np.concatenate([labels, np.full(8, C, np.int32)])
    w2 = np.concatenate([w, np.zeros(8, np.float32)])
    padded = seesaw_ce_loss(logits2, labels2, cum, C, weight=w2,
                            avg_factor=float(N))
    np.testing.assert_allclose(float(padded), float(base), rtol=1e-6)


def test_mask_rcnn_seesaw_cum_threading():
    """One mask_rcnn_seesaw train step: the (C+1,) cum_samples state in
    batch_stats must grow by the number of valid sampled ROIs, and a
    second step must keep accumulating."""
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

    cfg = load_config("configs/mask_rcnn_seesaw_r50_lvis.py")
    cfg.model = dataclasses.replace(cfg.model, depth=18, num_classes=6)
    cfg.data = dataclasses.replace(cfg.data, bucket=(64, 64),
                                   img_scale=(64, 64), max_gt=4,
                                   aspect_buckets=None, multi_scales=None)
    cfg.rcnn_num_proposals = 16
    cfg.rcnn_num_samples = 16
    model = build_model(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    assert variables["batch_stats"]["seesaw_cum"].shape == (7,)

    rng = np.random.RandomState(3)
    B, H, W = 2, 64, 64
    xy = rng.rand(B, 4, 2).astype(np.float32) * 30
    wh = rng.rand(B, 4, 2).astype(np.float32) * 20 + 6
    gtb = np.concatenate([xy, xy + wh], -1)
    yy, xx = np.mgrid[0:H // 4, 0:W // 4]
    gt_masks = jnp.asarray(
        ((yy[None, None] * 4 >= gtb[:, :, 1, None, None])
         & (yy[None, None] * 4 <= gtb[:, :, 3, None, None])
         & (xx[None, None] * 4 >= gtb[:, :, 0, None, None])
         & (xx[None, None] * 4 <= gtb[:, :, 2, None, None]))
        .astype(np.float32))
    batch = Batch(
        jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.1),
        jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32)),
        jnp.asarray(gtb),
        jnp.asarray(rng.randint(0, 6, (B, 4)).astype(np.int32)),
        jnp.asarray(np.tile(np.arange(4) < 2, (B, 1))),
        gt_masks=gt_masks)

    step = make_family_train_step("mask_rcnn_seesaw", model, cfg,
                                  num_prev=1, has_teacher=False,
                                  use_dropout=False)
    tx = make_optimizer(variables["params"],
                        step_lr_schedule(1e-4, iters_per_epoch=10))
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    s1, l1 = step(state, batch, None)
    cum1 = np.asarray(s1.batch_stats["seesaw_cum"]).copy()
    s2, l2 = step(s1, batch, None)
    cum2 = np.asarray(s2.batch_stats["seesaw_cum"])
    assert np.isfinite(float(l1["loss"])) and np.isfinite(float(l2["loss"]))
    assert float(l1["rcnn_loss_cls"]) > 0
    # the counts are monotone non-decreasing and grow by the valid
    # sampled-ROI count each step
    assert cum1.sum() > 0
    assert (cum2 >= cum1 - 1e-6).all()
    assert cum2.sum() > cum1.sum()

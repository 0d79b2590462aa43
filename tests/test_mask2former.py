"""Mask2Former: masked attention, point-sampled losses, BCE cost."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.mask2former import (Mask2Former,
                                         Mask2FormerLossConfig,
                                         _bce_cost_matrix,
                                         mask2former_loss)

NC = 5


def _tiny_batch(B=1, HW=64, G=3):
    from dskd_tpu.train.step import Batch
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, G, 2).astype(np.float32) * 20
    wh = rng.rand(B, G, 2).astype(np.float32) * 25 + 10
    gtb = np.concatenate([xy, xy + wh], -1)
    yy, xx = np.mgrid[0:HW // 4, 0:HW // 4]
    gm = ((yy[None, None] * 4 >= gtb[:, :, 1, None, None])
          & (yy[None, None] * 4 <= gtb[:, :, 3, None, None])
          & (xx[None, None] * 4 >= gtb[:, :, 0, None, None])
          & (xx[None, None] * 4 <= gtb[:, :, 2, None, None]))
    return Batch(images, img_hw, jnp.asarray(gtb),
                 jnp.asarray(rng.randint(0, NC, (B, G)).astype(np.int32)),
                 jnp.asarray(np.tile(np.arange(G) < 2, (B, 1))),
                 gt_masks=jnp.asarray(gm.astype(np.float32)))


def test_bce_cost_matrix_oracle():
    import torch
    rng = np.random.RandomState(0)
    p = rng.randn(4, 30).astype(np.float32)
    t = (rng.rand(3, 30) > 0.5).astype(np.float32)
    got = np.asarray(_bce_cost_matrix(jnp.asarray(p), jnp.asarray(t)))
    tp = torch.from_numpy(p)
    tt = torch.from_numpy(t)
    for q in range(4):
        for g in range(3):
            want = torch.nn.functional.binary_cross_entropy_with_logits(
                tp[q], tt[g], reduction="mean").item()
            np.testing.assert_allclose(got[q, g], want, rtol=1e-5)


def test_mask2former_forward_shapes():
    batch = _tiny_batch()
    model = Mask2Former(num_classes=NC, depth=18, num_queries=8,
                        num_decoder_layers=3)
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw)
    out = model.apply(v, batch.images, batch.img_hw)
    # num_layers + 1 predictions (the layer-0 input emits one too)
    assert out.cls_scores.shape == (4, 1, 8, NC + 1)
    assert out.mask_preds.shape == (4, 1, 8, 16, 16)


def test_mask2former_loss_finite_and_matched():
    batch = _tiny_batch()
    model = Mask2Former(num_classes=NC, depth=18, num_queries=8,
                        num_decoder_layers=3)
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw)
    out = model.apply(v, batch.images, batch.img_hw)
    cfg = Mask2FormerLossConfig(num_classes=NC, num_points=64)
    losses = mask2former_loss(out, batch.gt_labels, batch.gt_masks,
                              batch.gt_valid, jax.random.PRNGKey(1), cfg)
    assert "loss_cls" in losses and "d0.loss_dice" in losses
    assert len([k for k in losses if "loss_cls" in k]) == 4
    for val in losses.values():
        assert np.isfinite(float(val))


def test_mask2former_family_and_eval():
    from dskd_tpu.eval.evaluator import make_eval_step
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.utils.config import (DataConfig, DistillFlags,
                                       ExperimentConfig, ModelConfig)

    model = Mask2Former(num_classes=NC, depth=18, num_queries=8,
                        num_decoder_layers=3)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="mask2former", num_classes=NC),
        data=DataConfig(bucket=(64, 64)),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    batch = _tiny_batch()
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw)

    estep = make_eval_step(model, max_per_img=8, arch="mask2former")
    det = estep(v, batch.images, batch.img_hw, jnp.ones((1, 4)))
    assert det.masks.shape == (1, 8, 28, 28)

    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("mask2former", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, batch)
    assert np.isfinite(float(losses["loss"]))


def test_masked_cross_attention_restricts_keys():
    """The boolean mask must change attention (restricted vs full), and
    identical single-key restriction must reproduce attending that key
    alone."""
    from dskd_tpu.models.mask2former import MaskedCrossAttention

    rng = np.random.RandomState(0)
    B, Q, S, C = 1, 2, 6, 32
    q = jnp.asarray(rng.randn(B, Q, C).astype(np.float32))
    kv = jnp.asarray(rng.randn(B, S, C).astype(np.float32))
    qp = jnp.zeros((B, Q, C))
    kp = jnp.zeros((B, S, C))
    m = MaskedCrossAttention(C, num_heads=4)
    allow_all = jnp.ones((B, Q, S), bool)
    v = m.init(jax.random.PRNGKey(0), q, kv, qp, kp, allow_all)
    full = m.apply(v, q, kv, qp, kp, allow_all)
    one = jnp.zeros((B, Q, S), bool).at[:, :, 2].set(True)
    restricted = m.apply(v, q, kv, qp, kp, one)
    assert not np.allclose(np.asarray(full), np.asarray(restricted))
    # single-allowed-key attention == attending a 1-key sequence
    single = m.apply(v, q, kv[:, 2:3], qp, kp[:, 2:3],
                     jnp.ones((B, Q, 1), bool))
    np.testing.assert_allclose(np.asarray(restricted),
                               np.asarray(single), atol=1e-5)

"""Cascade RPN: region assignment, anchor-steered offsets, 2-stage loss."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.cascade_rpn_head import (CascadeRPN, anchor_offsets,
                                              crpn_anchors, crpn_loss,
                                              crpn_proposals,
                                              region_assign)

NC = 1


def test_region_assign_levels_and_regions():
    sizes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    anchors = crpn_anchors(sizes)
    # a gt of scale ~32px -> target level 0 (min anchor 8*4=32)
    gt = jnp.asarray([[8.0, 8.0, 40.0, 40.0], [0.0, 0.0, 0.0, 0.0]])
    valid = jnp.asarray([True, False])
    a = np.asarray(region_assign(anchors, sizes, gt, valid))
    n0 = 16 * 16
    # the gt center cell at level 0 is positive for gt 0
    assert (a[:n0] == 0).any()
    # no positives on other levels, and the invalid gt assigned nothing
    assert not (a[n0:] >= 0).any()
    assert not (a == 1).any()
    # ignore ring exists (some -1 around the center region)
    assert (a[:n0] == -1).any()
    # far-away anchors stay negative
    assert a[n0 - 1] == -2


def test_anchor_offsets_zero_for_canonical_anchor():
    """An anchor exactly at its grid center with side (ks-1+1)... the
    shape offset for side 2*stride (w/stride=2 -> w/(ks-1)-1 = 0) and
    centered position must be all-zero."""
    h = w = 4
    s = 8
    cy = (jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5) * s
    cx = (jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5) * s
    a = jnp.stack([
        jnp.broadcast_to(cx - s, (h, w)), jnp.broadcast_to(cy - s, (h, w)),
        jnp.broadcast_to(cx + s, (h, w)), jnp.broadcast_to(cy + s, (h, w))],
        -1).reshape(1, -1, 4)
    off = np.asarray(anchor_offsets(a, s, (h, w)))
    # centers on the half-pixel grid: center offset = +0.5 everywhere
    assert off.shape == (1, h, w, 18)
    np.testing.assert_allclose(off[..., 0::2], 0.5, atol=1e-5)  # dy
    np.testing.assert_allclose(off[..., 1::2], 0.5, atol=1e-5)  # dx


def _tiny_batch(B=1, HW=64, G=3):
    from dskd_tpu.train.step import Batch
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, G, 2).astype(np.float32) * 20
    wh = rng.rand(B, G, 2).astype(np.float32) * 25 + 10
    return Batch(images, img_hw,
                 jnp.asarray(np.concatenate([xy, xy + wh], -1)),
                 jnp.asarray(rng.randint(0, NC, (B, G)).astype(np.int32)),
                 jnp.asarray(np.tile(np.arange(G) < 2, (B, 1))))


def test_cascade_rpn_family_and_eval():
    from dskd_tpu.eval.evaluator import make_eval_step
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    batch = _tiny_batch()
    model = CascadeRPN(depth=18)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="cascade_rpn", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw)
    assert "stage0" in v["params"] and "stage1" in v["params"]
    assert "adapt_weight" in v["params"]["stage1"]

    estep = make_eval_step(model, max_per_img=16, arch="cascade_rpn")
    det = estep(v, batch.images, batch.img_hw, jnp.ones((1, 4)))
    assert det.bboxes.shape == (1, 16, 4)

    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("cascade_rpn", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, batch)
    assert "s0.loss_rpn_reg" in losses and "s1.loss_rpn_cls" in losses
    assert np.isfinite(float(losses["loss"]))

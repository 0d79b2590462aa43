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


def test_region_assign_matches_reference_loop():
    """Vectorized scan vs a direct python re-statement of the
    RegionAssigner loop (region_assigner.py:135-205) on random cases."""
    from dskd_tpu.models.cascade_rpn_head import (ANCHOR_SCALE, STRIDES,
                                                  crpn_anchors,
                                                  region_assign)

    rng = np.random.RandomState(0)
    sizes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    anchors = crpn_anchors(sizes)
    r1, r2 = (1 - 0.2) / 2, (1 - 0.5) / 2
    ctrs, lvl_ids = [], []
    for lvl, (a, s) in enumerate(zip(anchors, STRIDES)):
        a = np.asarray(a)
        ctrs.append(np.stack([(a[:, 0] + a[:, 2]) * 0.5 / s,
                              (a[:, 1] + a[:, 3]) * 0.5 / s], -1))
        lvl_ids.append(np.full(len(a), lvl))
    ctr = np.concatenate(ctrs)
    lvl_id = np.concatenate(lvl_ids)

    def flags(g, ratio, lvl):
        s = STRIDES[lvl]
        h, w = sizes[lvl]
        # calc_region clamps to the featmap EXTENT (region_assigner.py:20-23)
        x1 = np.clip(round((1 - ratio) * g[0] / s + ratio * g[2] / s), 0, w)
        y1 = np.clip(round((1 - ratio) * g[1] / s + ratio * g[3] / s), 0, h)
        x2 = np.clip(round(ratio * g[0] / s + (1 - ratio) * g[2] / s), 0, w)
        y2 = np.clip(round(ratio * g[1] / s + (1 - ratio) * g[3] / s), 0, h)
        return ((ctr[:, 0] >= x1) & (ctr[:, 0] <= x2)
                & (ctr[:, 1] >= y1) & (ctr[:, 1] <= y2)
                & (lvl_id == lvl))

    for trial in range(5):
        G = 4
        xy = rng.rand(G, 2) * 40
        wh = rng.rand(G, 2) * 60 + 8
        gt = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        valid = rng.rand(G) > 0.3
        got = np.asarray(region_assign(anchors, sizes, jnp.asarray(gt),
                                       jnp.asarray(valid)))
        scale = np.sqrt(np.clip(
            (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1]), 1e-6, None))
        tgt_lvl = np.clip(np.floor(
            np.log2(scale / (ANCHOR_SCALE * STRIDES[0])) + 0.5),
            0, 4).astype(int)
        want = np.full(len(ctr), -2)
        adj = np.zeros(len(ctr), bool)
        for g in range(G):
            if not valid[g]:
                continue
            lvl = tgt_lvl[g]
            want[flags(gt[g], r2, lvl)] = -1
            want[flags(gt[g], r1, lvl)] = g
            if lvl > 0:
                adj |= flags(gt[g], r2, lvl - 1)
            if lvl < 4:
                adj |= flags(gt[g], r2, lvl + 1)
        want[adj] = -1
        np.testing.assert_array_equal(got, want)

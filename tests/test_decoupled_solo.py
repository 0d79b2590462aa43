"""Decoupled SOLO (solo_head.py:570-1177): static 3x3-candidate dice vs a
numpy oracle over the assign map, head shapes (split vs light shared
tower), family train step, decode/eval."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.solo import (DecoupledSOLO, DecoupledSOLOHead,
                                  decoupled_solo_decode,
                                  decoupled_solo_loss, solo_targets)

NC = 4


def _batch(B=1, HW=64, G=3, seed=0):
    from dskd_tpu.train.step import Batch
    rng = np.random.RandomState(seed)
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


def test_head_shapes_and_light_sharing():
    feats = [jnp.zeros((1, 16 // 2 ** i, 16 // 2 ** i, 32))
             for i in range(5)]
    head = DecoupledSOLOHead(num_classes=NC, stacked_convs=2,
                             feat_channels=32, num_grids=(8, 8, 6, 4, 4))
    v = head.init(jax.random.PRNGKey(0), feats)
    mx, my, c = head.apply(v, feats)
    assert mx[0].shape == (1, 16, 16, 8)      # S channels, not S^2
    assert my[0].shape == (1, 16, 16, 8)
    assert c[0].shape == (1, 8, 8, NC)
    # separate x/y towers in the full head
    assert any(k.startswith("mask_x_conv") for k in v["params"])
    assert any(k.startswith("mask_y_conv") for k in v["params"])

    light = DecoupledSOLOHead(num_classes=NC, stacked_convs=2,
                              feat_channels=32, num_grids=(8, 8, 6, 4, 4),
                              light=True)
    vl = light.init(jax.random.PRNGKey(0), feats)
    mx, my, _ = light.apply(vl, feats)
    assert mx[0].shape == (1, 16, 16, 8)
    # one shared tower in the light head (solo_head.py:1080-1100)
    assert any(k.startswith("mask_conv") for k in vl["params"])
    assert not any(k.startswith("mask_x_conv") for k in vl["params"])


def test_decoupled_dice_matches_assign_map_oracle():
    """The static G*9 candidate set must cover exactly the positive cells
    of the assign map, and the dice must equal a per-positive-cell numpy
    evaluation of sigmoid(y_i)*sigmoid(x_j) vs the GT bitmap."""
    H = W = 64
    S = 8
    batch = _batch(B=1, HW=H, G=3, seed=3)
    rng = np.random.RandomState(1)
    # one level with full-range scales so every valid GT lands
    mx = jnp.asarray(rng.randn(1, 32, 32, S).astype(np.float32))
    my = jnp.asarray(rng.randn(1, 32, 32, S).astype(np.float32))
    cls = jnp.zeros((1, S, S, NC), np.float32)

    from dskd_tpu.models.solo import DecoupledSOLOOutputs
    out = DecoupledSOLOOutputs((mx,), (my,), (cls,))
    losses = decoupled_solo_loss(
        out, batch.gt_bboxes, batch.gt_labels, batch.gt_valid,
        batch.gt_masks, (H, W), NC, num_grids=(S,),
        scale_ranges=((1, 2048),))

    # oracle from the (independently tested) assign map
    tm = solo_targets(batch.gt_bboxes[0], batch.gt_labels[0],
                      batch.gt_valid[0], batch.gt_masks[0], (H, W), NC,
                      num_grids=(S,), scale_ranges=((1, 2048),))
    assign = np.asarray(tm[0][1])
    sx = 1 / (1 + np.exp(-np.asarray(mx[0])))
    sy = 1 / (1 + np.exp(-np.asarray(my[0])))
    # mask targets at the mask-pred resolution (32x32 here = stride-4/2)
    tgt = np.asarray(jax.image.resize(
        batch.gt_masks[0].transpose(1, 2, 0), (32, 32, 3), "bilinear"))
    tgt = (tgt > 0.5).astype(np.float32)
    dice_sum, npos = 0.0, 0
    for i in range(S):
        for j in range(S):
            g = assign[i, j] - 1
            if g < 0:
                continue
            pred = sy[:, :, i] * sx[:, :, j]
            t = tgt[:, :, g]
            inter = (pred * t).sum()
            dice = 2 * inter / ((pred ** 2).sum() + 1e-3
                                + (t ** 2).sum() + 1e-3)
            dice_sum += 1.0 - dice
            npos += 1
    want = 3.0 * dice_sum / max(npos, 1)
    np.testing.assert_allclose(float(losses["loss_mask"]), want,
                               rtol=2e-5)
    assert npos > 0


def test_loss_and_family_step_both_variants():
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    batch = _batch()
    for arch in ("decoupled_solo", "decoupled_solo_light"):
        model = DecoupledSOLO(num_classes=NC, depth=18,
                              light=arch.endswith("light"))
        v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw)
        out = model.apply(v, batch.images, batch.img_hw)
        losses = decoupled_solo_loss(
            out, batch.gt_bboxes, batch.gt_labels, batch.gt_valid,
            batch.gt_masks, (64, 64), NC, scale_ranges=model.scale_ranges)
        assert np.isfinite(float(losses["loss_mask"]))
        assert np.isfinite(float(losses["loss_cls"]))

        cfg = ExperimentConfig(
            model=ModelConfig(arch=arch, num_classes=NC),
            distill=DistillFlags(cates_distill="", feats_distill=""))
        step = make_family_train_step(arch, model, cfg, num_prev=0,
                                      has_teacher=False, use_dropout=False)
        tx = make_optimizer(v["params"], lambda i: 1e-4)
        state = TrainState.create(v["params"], v.get("batch_stats", {}),
                                  tx, jax.random.PRNGKey(1))
        _, ls = step(state, batch)
        assert np.isfinite(float(ls["loss"]))


def test_decode_and_eval_step():
    from dskd_tpu.eval.evaluator import make_eval_step

    batch = _batch()
    model = DecoupledSOLO(num_classes=NC, depth=18)
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw)
    out = model.apply(v, batch.images, batch.img_hw)
    d = decoupled_solo_decode(out, (64, 64), NC, score_thr=0.0,
                              nms_pre=16, max_per_img=8, filter_thr=0.0)
    assert d["bboxes"].shape == (1, 8, 4)
    assert d["masks28"].shape == (1, 8, 28, 28)
    b, va = np.asarray(d["bboxes"]), np.asarray(d["valid"])
    if va.any():
        assert np.all(b[va][:, 2] > b[va][:, 0])

    step = make_eval_step(model, max_per_img=8, arch="decoupled_solo")
    det = step(v, batch.images, batch.img_hw, jnp.ones((1, 4)))
    assert det.masks.shape == (1, 8, 28, 28)

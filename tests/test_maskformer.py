"""MaskFormer: mask-classification losses, cost matrices, decode."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.maskformer import (MaskFormer, MaskFormerLossConfig,
                                        _focal_cost_matrix,
                                        _naive_dice_matrix,
                                        maskformer_decode, maskformer_loss)

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


def test_dice_cost_matrix_oracle():
    """Matrix form must equal the naive dice computed pairwise (torch
    match_costs.DiceCost formula)."""
    rng = np.random.RandomState(0)
    p = jax.nn.sigmoid(jnp.asarray(rng.randn(4, 50).astype(np.float32)))
    t = jnp.asarray((rng.rand(3, 50) > 0.5).astype(np.float32))
    got = np.asarray(_naive_dice_matrix(p, t))
    for q in range(4):
        for g in range(3):
            inter = float((p[q] * t[g]).sum())
            want = 1 - (2 * inter + 1.0) / (float(p[q].sum())
                                            + float(t[g].sum()) + 1.0)
            np.testing.assert_allclose(got[q, g], want, rtol=1e-5)


def test_focal_cost_prefers_matching_mask():
    t = np.zeros((2, 64), np.float32)
    t[0, :32] = 1
    t[1, 32:] = 1
    logits = jnp.asarray(np.stack([np.where(t[0] > 0, 6.0, -6.0),
                                   np.where(t[1] > 0, 6.0, -6.0)]))
    cost = np.asarray(_focal_cost_matrix(logits, jnp.asarray(t)))
    assert cost[0, 0] < cost[0, 1] and cost[1, 1] < cost[1, 0]


def test_maskformer_loss_and_model():
    batch = _tiny_batch()
    model = MaskFormer(num_classes=NC, depth=18, num_queries=8,
                       num_decoder_layers=2)
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw)
    out = model.apply(v, batch.images, batch.img_hw)
    assert out.cls_scores.shape == (2, 1, 8, NC + 1)
    assert out.mask_preds.shape == (2, 1, 8, 16, 16)
    losses = maskformer_loss(out, batch.gt_labels, batch.gt_masks,
                             batch.gt_valid,
                             MaskFormerLossConfig(num_classes=NC))
    assert "loss_cls" in losses and "d0.loss_dice" in losses
    for val in losses.values():
        assert np.isfinite(float(val))


def test_maskformer_family_step_and_eval():
    from dskd_tpu.eval.evaluator import make_eval_step
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    model = MaskFormer(num_classes=NC, depth=18, num_queries=8,
                       num_decoder_layers=2)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="maskformer", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    batch = _tiny_batch()
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw)

    estep = make_eval_step(model, max_per_img=8, arch="maskformer")
    det = estep(v, batch.images, batch.img_hw, jnp.ones((1, 4)))
    assert det.masks.shape == (1, 8, 28, 28)
    assert det.bboxes.shape == (1, 8, 4)

    # train step last: it DONATES the state buffers
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("maskformer", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, batch)
    assert np.isfinite(float(losses["loss"]))


def test_maskformer_decode_perfect_query():
    """A query with a confident class and a crisp mask must decode to
    that mask's extent box."""
    Q, C, Hm = 4, NC, 16
    cls = np.full((1, 1, Q, C + 1), -5.0, np.float32)
    cls[0, 0, 1, 2] = 8.0                  # query 1 -> class 2
    masks = np.full((1, 1, Q, Hm, Hm), -8.0, np.float32)
    masks[0, 0, 1, 4:8, 2:6] = 8.0
    from dskd_tpu.models.maskformer import MaskFormerOutputs
    out = MaskFormerOutputs(jnp.asarray(cls), jnp.asarray(masks), None)
    d = maskformer_decode(out, num_classes=C, max_per_img=4)
    b = np.asarray(d["bboxes"][0, 0])
    assert int(d["labels"][0, 0]) == 2
    np.testing.assert_allclose(b, [8, 16, 24, 32], atol=1e-3)
    assert bool(d["valid"][0, 0])


def test_maskformer_panoptic_fuse_and_pq():
    """Fusion reproduces the reference's keep/overwrite rules and a
    self-consistent prediction scores PQ == 1."""
    from dskd_tpu.eval.panoptic_eval import PQStat
    from dskd_tpu.models.maskformer import maskformer_panoptic_fuse
    from dskd_tpu.models.panoptic_fpn import INSTANCE_OFFSET

    NT, NS = 2, 2
    C = NT + NS
    H = W = 16
    cls = np.full((4, C + 1), -8.0, np.float32)
    cls[0, 1] = 8.0          # thing class 1
    cls[1, 3] = 8.0          # stuff class 3
    cls[2, 0] = 0.0          # low-confidence -> dropped by 0.8 thr
    cls[3, C] = 8.0          # background query -> dropped
    masks = np.full((4, H, W), -8.0, np.float32)
    masks[0, 2:8, 2:8] = 8.0
    masks[1, 8:, :] = 8.0
    masks[2] = 8.0
    masks[3] = 8.0
    pan = maskformer_panoptic_fuse(cls, masks, NT, NS)
    assert pan[4, 4] == 1 + 1 * INSTANCE_OFFSET       # thing instance
    assert pan[12, 4] == 3                            # stuff segment
    assert pan[0, 12] == C                            # void elsewhere

    stat = PQStat()
    stat.add_image(pan, pan, void_label=C)
    res = stat.summarize(list(range(NT)), list(range(NT, C)))
    assert abs(res["PQ"] - 100.0) < 1e-4


def test_append_stuff_gt_and_panoptic_family():
    from dskd_tpu.models.maskformer import append_stuff_gt
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.incremental import build_model
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    batch = _tiny_batch()
    NT, NS = NC, 2
    sem = np.full((1, 16, 16), 255, np.int32)
    sem[0, :4] = NT                 # stuff class 0 present
    batch = batch._replace(gt_semantic=jnp.asarray(sem))
    gl, gm, gv = append_stuff_gt(batch.gt_labels, batch.gt_masks,
                                 batch.gt_valid, batch.gt_semantic, NT, NS)
    assert gl.shape[1] == batch.gt_labels.shape[1] + NS
    assert int(gl[0, -NS]) == NT and bool(gv[0, -NS])
    assert not bool(gv[0, -NS + 1])          # absent stuff class invalid
    np.testing.assert_array_equal(np.asarray(gm[0, -NS, :4]), 1.0)

    cfg = ExperimentConfig(
        model=ModelConfig(arch="maskformer", num_classes=NT,
                          num_stuff_classes=NS, panoptic=True,
                          num_query=8, depth=18),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    model = build_model(cfg)
    assert model.num_classes == NT + NS
    model = type(model)(num_classes=NT + NS, depth=18, num_queries=8,
                        num_decoder_layers=2)
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw)
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("maskformer", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, batch)
    assert np.isfinite(float(losses["loss"]))

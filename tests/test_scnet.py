"""SCNet: global context loss, feature relay, single-pass mask branch."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.scnet import SCNet, glbctx_loss

NC = 5
SEM = 7


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
    sem = rng.randint(0, SEM, (B, HW // 4, HW // 4)).astype(np.int32)
    return Batch(images, img_hw, jnp.asarray(gtb),
                 jnp.asarray(rng.randint(0, NC, (B, G)).astype(np.int32)),
                 jnp.asarray(np.tile(np.arange(G) < 2, (B, 1))),
                 gt_masks=jnp.asarray(gm.astype(np.float32)),
                 gt_semantic=jnp.asarray(sem))


def test_glbctx_loss_targets_present_classes():
    # logits strongly predicting exactly the present classes -> tiny loss
    labels = jnp.asarray([[0, 2, 2]])
    valid = jnp.ones((1, 3), bool)
    good = jnp.asarray([[9.0, -9.0, 9.0, -9.0, -9.0]])
    bad = -good
    assert float(glbctx_loss(good, labels, valid)) < 0.01
    assert float(glbctx_loss(bad, labels, valid)) > 1.0
    # invalid GT do not create targets
    labels2 = jnp.asarray([[0, 2, 4]])
    valid2 = jnp.asarray([[True, True, False]])
    assert float(glbctx_loss(good, labels2, valid2)) < 0.01


def test_scnet_family_step():
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    model = SCNet(num_classes=NC, depth=18, semantic_classes=SEM)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="scnet", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    cfg.rcnn_num_proposals = 16
    cfg.rcnn_num_samples = 16
    batch = _tiny_batch()
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw,
                   method=SCNet.init_all)
    for key in ("semantic_head", "glbctx_head", "feat_relay_head",
                "mask_head"):
        assert key in v["params"], key
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("scnet", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, batch)
    assert "loss_semantic_seg" in losses and "loss_glbctx" in losses
    assert "loss_mask" in losses           # ONE mask loss, not per stage
    assert "s0.loss_mask" not in losses
    for st in range(3):
        assert f"s{st}.loss_cls" in losses
    assert np.isfinite(float(losses["loss"]))


def test_scnet_relay_changes_masks():
    """The relayed bbox feature must influence the mask logits."""
    model = SCNet(num_classes=NC, depth=18, semantic_classes=SEM)
    images = jnp.zeros((1, 64, 64, 3))
    img_hw = jnp.asarray([[64, 64]], np.int32)
    v = model.init(jax.random.PRNGKey(0), images, img_hw,
                   method=SCNet.init_all)
    f14 = jax.random.normal(jax.random.PRNGKey(2), (2, 14, 14, 256))
    s0 = jnp.zeros((2, 1024))
    s1 = jax.random.normal(jax.random.PRNGKey(3), (2, 1024))
    m0 = model.apply(v, f14, s0, method=SCNet.mask_forward)
    m1 = model.apply(v, f14, s1, method=SCNet.mask_forward)
    assert m0.shape == (2, 28, 28, NC)
    assert not np.allclose(np.asarray(m0), np.asarray(m1))


def test_scnet_eval_step():
    from dskd_tpu.eval.evaluator import make_eval_step

    model = SCNet(num_classes=NC, depth=18, semantic_classes=SEM)
    B, HW = 1, 64
    images = jnp.zeros((B, HW, HW, 3))
    img_hw = jnp.asarray([[HW, HW]], np.int32)
    v = model.init(jax.random.PRNGKey(0), images, img_hw,
                   method=SCNet.init_all)
    step = make_eval_step(model, max_per_img=8, arch="scnet")
    det = step(v, images, img_hw, jnp.ones((B, 4)))
    assert det.masks.shape == (B, 8, 28, 28)
    assert det.bboxes.shape == (B, 8, 4)

"""FoveaBox + FSAF families: target geometry, online level selection,
losses, decode, one train step each."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.foveabox import (FoveaBox, FoveaLossConfig,
                                      _level_targets, fovea_get_bboxes,
                                      fovea_loss)
from dskd_tpu.models.fsaf import (FSAF, FSAFLossConfig, _shrunk_mask,
                                  fsaf_get_bboxes, fsaf_loss)

B, HW, NC = 2, 64, 6


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, 3, 2).astype(np.float32) * 20
    wh = rng.rand(B, 3, 2).astype(np.float32) * 25 + 12
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, NC, (B, 3)).astype(np.int32))
    valid = jnp.asarray(np.tile(np.arange(3) < 2, (B, 1)))
    return images, img_hw, gt, labels, valid


def test_fovea_level_targets_geometry():
    """A sqrt-area-40 GT belongs to level 0 (range 1-64) and level 1
    (32-128); its fovea region covers only the shrunk center."""
    gt = jnp.asarray(np.array([[8, 8, 48, 48]], np.float32))   # area 40^2
    labels = jnp.asarray(np.array([2], np.int32))
    valid = jnp.asarray(np.array([True]))
    lab, t, pos = _level_targets(8, 8, 8, 16, 1, 64, gt, labels, valid, NC)
    pos2 = np.asarray(pos).reshape(8, 8)
    assert pos2.any()
    # center cell (28, 28) -> cell (3, 3) positive; border cell (1, 1) not
    assert pos2[3, 3] and not pos2[0, 0]
    assert np.asarray(lab).reshape(8, 8)[3, 3] == 2
    # out-of-range level carries nothing
    _, _, pos_hi = _level_targets(2, 2, 64, 256, 256, 2048, gt, labels,
                                  valid, NC)
    assert not np.asarray(pos_hi).any()


def test_fsaf_shrunk_mask():
    gt = jnp.asarray(np.array([[0, 0, 40, 40]], np.float32))
    m = np.asarray(_shrunk_mask(8, 8, 8, gt, 0.2))[0]
    # 0.2-shrunk box of [0,40] is [16, 24]: only cell center 20 -> (2,2)
    assert m[2, 2] and m.sum() == 1
    m5 = np.asarray(_shrunk_mask(8, 8, 8, gt, 0.5))[0]
    assert m5.sum() > m.sum()


def _family_smoke(arch, model_cls):
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    images, img_hw, gt, labels, valid = _inputs()
    model = model_cls(num_classes=NC, depth=18)
    cfg = ExperimentConfig(model=ModelConfig(arch=arch, num_classes=NC),
                           distill=DistillFlags(cates_distill="",
                                                feats_distill=""))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    tx = make_optimizer(variables["params"], lambda i: 1e-4)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step(arch, model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, Batch(images, img_hw, gt, labels, valid))
    for k, v in losses.items():
        assert np.isfinite(float(v)), (arch, k, float(v))


def test_fovea_forward_loss_decode_step():
    images, img_hw, gt, labels, valid = _inputs()
    model = FoveaBox(num_classes=NC, depth=18)
    v = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(v, images, img_hw)
    assert len(out.head.cls_scores) == 5
    losses = fovea_loss(out.head, gt, labels, valid,
                        FoveaLossConfig(num_classes=NC))
    assert all(np.isfinite(float(x)) for x in losses.values())
    d = fovea_get_bboxes(out.head, img_hw, score_thr=-1.0, max_per_img=5)
    bb = np.asarray(d["bboxes"])
    assert bb.shape == (B, 5, 4) and (bb >= 0).all()
    _family_smoke("foveabox", FoveaBox)


def test_fsaf_forward_loss_decode_step():
    images, img_hw, gt, labels, valid = _inputs()
    model = FSAF(num_classes=NC, depth=18)
    v = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(v, images, img_hw)
    # distances strictly positive (relu + eps)
    assert (np.asarray(out.head.bbox_preds[0]) > 0).all()
    losses = fsaf_loss(out.head, gt, labels, valid,
                       FSAFLossConfig(num_classes=NC))
    assert all(np.isfinite(float(x)) for x in losses.values())
    d = fsaf_get_bboxes(out.head, img_hw, score_thr=-1.0, max_per_img=5)
    assert d["bboxes"].shape == (B, 5, 4)
    _family_smoke("fsaf", FSAF)

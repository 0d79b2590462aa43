"""SABL RetinaNet: approx assignment invariants, forward/loss/decode/step."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.sabl_retina import (SABLLossConfig, SABLRetinaNet,
                                         approx_max_iou_assign,
                                         sabl_anchors, sabl_get_bboxes,
                                         sabl_loss)

B, HW, NC = 2, 64, 6


def test_approx_assign_uses_max_over_approxs():
    """A tall gt matches a cell only through its tall-ratio approx: the
    square anchor alone would miss it."""
    approxs = jnp.asarray(np.array([[
        [12, 0, 20, 32],       # tall approx — IoU with gt high
        [8, 8, 24, 24],        # square
        [0, 12, 32, 20],       # wide
    ] + [[0, 0, 1, 1]] * 6], np.float32))        # pad to 9
    gt = jnp.asarray(np.array([[12, 0, 20, 32]], np.float32))
    assigned, pos, labels = approx_max_iou_assign(
        approxs, gt, jnp.asarray(np.array([3], np.int32)),
        jnp.asarray(np.array([True])), NC)
    assert bool(pos[0]) and int(labels[0]) == 3


def test_sabl_forward_loss_decode_step():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, 3, 2).astype(np.float32) * 20
    wh = rng.rand(B, 3, 2).astype(np.float32) * 25 + 10
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, NC, (B, 3)).astype(np.int32))
    valid = jnp.asarray(np.tile(np.arange(3) < 2, (B, 1)))

    model = SABLRetinaNet(num_classes=NC, depth=18)
    v = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(v, images, img_hw)
    assert out.head.bucket_cls[0].shape[-1] == 4 * 7
    squares, approxs = sabl_anchors(
        [c.shape[1:3] for c in out.head.cls_scores])
    assert approxs.shape[1:] == (9, 4)

    losses = sabl_loss(out.head, squares, approxs, gt, labels, valid,
                       SABLLossConfig(num_classes=NC))
    assert {"loss_cls", "loss_bbox_cls", "loss_bbox_reg"} == set(losses)
    for k, x in losses.items():
        assert np.isfinite(float(x)), (k, float(x))

    d = sabl_get_bboxes(out.head, squares, img_hw, score_thr=-1.0,
                        max_per_img=5)
    assert d["bboxes"].shape == (B, 5, 4)

    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="sabl_retina", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("sabl_retina", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, Batch(images, img_hw, gt, labels, valid))
    assert np.isfinite(float(losses["loss"]))

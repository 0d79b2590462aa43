"""Sparse R-CNN: dynamic conv shapes, stage refinement, loss/decode/step."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.sparse_rcnn import (DynamicConv, SparseRCNN,
                                         SparseRCNNLossConfig,
                                         sparse_rcnn_get_bboxes,
                                         sparse_rcnn_loss)

B, HW, NC = 1, 64, 6


def test_dynamic_conv_shapes():
    m = DynamicConv(in_channels=32, feat_channels=8)
    pf = jnp.zeros((5, 32))
    rf = jnp.zeros((5, 7, 7, 32))
    v = m.init(jax.random.PRNGKey(0), pf, rf)
    out = m.apply(v, pf, rf)
    assert out.shape == (5, 32)
    assert v["params"]["dynamic_layer"]["kernel"].shape == (32, 2 * 32 * 8)


def test_sparse_rcnn_forward_loss_decode_step():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, 3, 2).astype(np.float32) * 20
    wh = rng.rand(B, 3, 2).astype(np.float32) * 25 + 10
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, NC, (B, 3)).astype(np.int32))
    valid = jnp.asarray(np.tile(np.arange(3) < 2, (B, 1)))

    model = SparseRCNN(num_classes=NC, depth=18, num_proposals=8,
                       num_stages=2)
    v = model.init(jax.random.PRNGKey(0), images, img_hw)
    # learned boxes start as the whole image
    np.testing.assert_allclose(
        np.asarray(v["params"]["init_proposal_boxes"])[0],
        [0.5, 0.5, 1.0, 1.0])
    out = model.apply(v, images, img_hw)
    assert out.cls_scores.shape == (2, B, 8, NC)
    assert out.bboxes.shape == (2, B, 8, 4)
    # stage boxes actually refine (stage outputs differ)
    assert float(jnp.abs(out.bboxes[1] - out.bboxes[0]).max()) > 0

    losses = sparse_rcnn_loss(out, gt, labels, valid, img_hw,
                              SparseRCNNLossConfig(num_classes=NC))
    assert {"loss_cls", "loss_bbox", "loss_iou",
            "s0.loss_cls"} <= set(losses)
    for k, x in losses.items():
        assert np.isfinite(float(x)), (k, float(x))

    d = sparse_rcnn_get_bboxes(out, img_hw, score_thr=-1.0, max_per_img=5)
    assert d["bboxes"].shape == (B, 5, 4)

    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="sparse_rcnn", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("sparse_rcnn", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, Batch(images, img_hw, gt, labels, valid))
    assert np.isfinite(float(losses["loss"]))

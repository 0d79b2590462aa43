"""GuidedAnchor: bounded-IoU algebra, anchor generation, loss/decode/step."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.guided_anchor import (GALossConfig, GARetinaNet,
                                           bounded_iou_loss, ga_geometry,
                                           ga_get_bboxes, ga_loss,
                                           guided_anchors)

B, HW, NC = 2, 64, 6


def test_bounded_iou_zero_at_match():
    box = jnp.asarray(np.array([[10, 10, 30, 40]], np.float32))
    l = np.asarray(bounded_iou_loss(box, box))
    np.testing.assert_allclose(l, 0.0, atol=1e-6)
    shifted = box + jnp.asarray([[2, 0, 2, 0]])
    assert float(bounded_iou_loss(shifted, box).sum()) > 0


def test_guided_anchor_shapes():
    centers, strides, approxs, counts = ga_geometry([(8, 8), (4, 4)])
    shape = jnp.zeros((1, centers.shape[0], 2))
    anc = np.asarray(guided_anchors(centers, strides, shape))[0]
    # d=0 -> square anchor wh = scale(4) * stride, centered on the cell
    # (square_anchor_generator scales=[4] in ga_retinanet configs)
    w0 = anc[0, 2] - anc[0, 0]
    assert abs(w0 - 4 * 8) < 1e-4
    assert approxs.shape == (80, 9, 4)


def test_ga_forward_loss_decode_step():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, 3, 2).astype(np.float32) * 20
    wh = rng.rand(B, 3, 2).astype(np.float32) * 25 + 10
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, NC, (B, 3)).astype(np.int32))
    valid = jnp.asarray(np.tile(np.arange(3) < 2, (B, 1)))

    model = GARetinaNet(num_classes=NC, depth=18)
    v = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(v, images, img_hw)
    assert out.head.loc_preds[0].shape[-1] == 1
    assert out.head.shape_preds[0].shape[-1] == 2

    centers, strides, approxs, counts = ga_geometry(
        [c.shape[1:3] for c in out.head.cls_scores])
    losses = ga_loss(out.head, centers, strides, approxs, counts, gt,
                     labels, valid, GALossConfig(num_classes=NC))
    assert {"loss_loc", "loss_shape", "loss_cls",
            "loss_bbox"} == set(losses)
    for k, x in losses.items():
        assert np.isfinite(float(x)), (k, float(x))

    d = ga_get_bboxes(out.head, centers, strides, img_hw, score_thr=-1.0,
                      loc_thr=0.0, max_per_img=5)
    assert d["bboxes"].shape == (B, 5, 4)

    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="ga_retina", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("ga_retina", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, Batch(images, img_hw, gt, labels, valid))
    assert np.isfinite(float(losses["loss"]))


def test_ga_rpn_family_and_eval():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dskd_tpu.eval.evaluator import make_eval_step
    from dskd_tpu.models.guided_anchor import GARPN
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    rng = np.random.RandomState(0)
    B, HW, G = 1, 64, 3
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, G, 2).astype(np.float32) * 20
    wh = rng.rand(B, G, 2).astype(np.float32) * 25 + 10
    batch = Batch(images, img_hw,
                  jnp.asarray(np.concatenate([xy, xy + wh], -1)),
                  jnp.asarray(np.zeros((B, G), np.int32)),
                  jnp.asarray(np.tile(np.arange(G) < 2, (B, 1))))
    model = GARPN(depth=18)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="ga_rpn", num_classes=1),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    v = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw)
    assert "conv_loc" in v["params"]["rpn_head"]

    estep = make_eval_step(model, max_per_img=16, arch="ga_rpn")
    det = estep(v, batch.images, batch.img_hw, jnp.ones((1, 4)))
    assert det.bboxes.shape == (1, 16, 4)

    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("ga_rpn", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, batch)
    for k in ("loss_loc", "loss_shape", "loss_cls", "loss_bbox"):
        assert k in losses
    assert np.isfinite(float(losses["loss"]))

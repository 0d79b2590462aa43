"""TridentNet detector: branch batch expansion, weight-shared dilations,
C4 res5 ROI head, family train step, eval decode."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.trident import (TRIDENT_DILATIONS, TridentFasterRCNN)

B, HW, NC = 1, 64, 6


def _batch():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, 3, 2).astype(np.float32) * 20
    wh = rng.rand(B, 3, 2).astype(np.float32) * 25 + 10
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, NC, (B, 3)).astype(np.int32))
    valid = jnp.asarray(np.tile(np.arange(3) < 2, (B, 1)))
    return images, img_hw, gt, labels, valid


def test_trident_branches_and_roi_head():
    images, img_hw, *_ = _batch()
    model = TridentFasterRCNN(num_classes=NC, depth=50, frozen_stages=-1)
    v = model.init(jax.random.PRNGKey(0), images, img_hw,
                   method=TridentFasterRCNN.init_all)
    # test mode: single branch, stride 16, 1024 channels
    out = model.apply(v, images, img_hw)
    assert out.c4.shape == (B, HW // 16, HW // 16, 1024)
    assert out.num_branch == 1
    # train mode: 3x batch expansion, SAME params (no extra weights)
    out3 = model.apply(v, images, img_hw, train_branches=True)
    assert out3.c4.shape == (3 * B, HW // 16, HW // 16, 1024)
    assert out3.num_branch == 3
    # deploy branch is dilation 2 = branch index 1 of the train stack
    np.testing.assert_allclose(np.asarray(out3.c4[B:2 * B]),
                               np.asarray(out.c4), atol=1e-5)
    # RPN: 15 anchors per location (5 scales x 3 ratios), single level
    assert len(out.rpn.cls_scores) == 1
    assert out.rpn.cls_scores[0].shape[-1] == 15
    # res5 ROI head: 14x14 conv4 feats -> (NC+1) cls + NC*4 reg
    cls, reg = model.apply(v, jnp.zeros((4, 14, 14, 1024)),
                           method=TridentFasterRCNN.roi_forward)
    assert cls.shape == (4, NC + 1) and reg.shape == (4, NC * 4)


def test_trident_family_step_and_eval():
    from dskd_tpu.eval.evaluator import make_eval_step
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    images, img_hw, gt, labels, valid = _batch()
    model = TridentFasterRCNN(num_classes=NC, depth=18, frozen_stages=-1)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="tridentnet", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    cfg.rcnn_num_proposals = 16
    cfg.rcnn_num_samples = 16
    v = model.init(jax.random.PRNGKey(0), images, img_hw,
                   method=TridentFasterRCNN.init_all)
    # eval BEFORE the train step: the donating step consumes the buffers
    # v["params"] shares with state.params
    ev = make_eval_step(model, arch="tridentnet", score_thr=-1.0,
                        max_per_img=5)
    det = ev(v, images, img_hw, jnp.ones((B, 4), jnp.float32))
    assert det.bboxes.shape == (B, 5, 4)
    det.bboxes.block_until_ready()

    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("tridentnet", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, Batch(images, img_hw, gt, labels, valid))
    assert {"loss_rpn_cls", "rcnn_loss_cls"} <= set(losses)
    assert np.isfinite(float(losses["loss"]))

"""End-to-end train-step tests on tiny shapes (CPU).

Mirrors the reference's test strategy (tests/test_models/test_forward.py):
build a small real model, feed synthetic batches, assert losses are finite
and gradients flow — plus the IL scenario the reference never tested:
teacher+student incremental step with the full distill menu.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dskd_tpu.distill.losses import DistillConfig
from dskd_tpu.models.detector import GFLDeformableDETR
from dskd_tpu.models.gfl_detr_loss import DetLossConfig
from dskd_tpu.train.optim import make_optimizer
from dskd_tpu.train.schedule import step_lr_schedule
from dskd_tpu.train.state import TrainState
from dskd_tpu.train.step import Batch, compute_losses, make_train_step


def tiny_model():
    return GFLDeformableDETR(num_encoder_layers=2, num_decoder_layers=2,
                             num_query=24, depth=18, frozen_stages=1,
                             num_classes=10, dropout=0.0)


def tiny_batch(rng=0, B=2, H=64, W=64, G=5, num_classes=10):
    r = np.random.RandomState(rng)
    images = r.randn(B, H, W, 3).astype(np.float32) * 0.1
    img_hw = np.array([[H, W - 8], [H - 10, W]], np.int32)[:B]
    boxes = r.rand(B, G, 4).astype(np.float32)
    xy = boxes[..., :2] * 30
    wh = boxes[..., 2:] * 20 + 4
    gt = np.concatenate([xy, xy + wh], -1)
    labels = r.randint(0, num_classes, size=(B, G)).astype(np.int32)
    valid = np.zeros((B, G), bool)
    valid[:, :3] = True
    return Batch(jnp.array(images), jnp.array(img_hw), jnp.array(gt),
                 jnp.array(labels), jnp.array(valid))


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    batch = tiny_batch()
    variables = model.init(jax.random.PRNGKey(0), batch.images, batch.img_hw)
    return model, batch, variables


def test_detection_losses_finite(setup):
    model, batch, variables = setup
    det_cfg = DetLossConfig(num_classes=10)
    losses = compute_losses(model, variables, batch, det_cfg)
    # key structure matches the reference: last layer unprefixed + d{i}.
    assert {"loss_cls", "loss_bbox", "loss_iou", "loss_dfl"} <= set(losses)
    assert any(k.startswith("d0.") for k in losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_incremental_step_with_full_distill_menu(setup):
    model, batch, variables = setup
    det_cfg = DetLossConfig(num_classes=10)
    distill_cfg = DistillConfig.from_flags(
        cates_distill="hard + teacher-first + soft",
        locat_distill="bbox + logit",
        feats_distill="corr + fg_info + decode_v1 + kldv",
        memory_distill="memory", num_prev=5)
    losses = compute_losses(
        model, variables, batch, det_cfg,
        teacher_variables=variables, distill_cfg=distill_cfg,
        teacher_score_thr=-1.0,  # keep everything: exercises all paths
        teacher_max_per_img=10)
    expected = {"loss_corr", "loss_kd", "loss_ld_bbox", "loss_ld_logit",
                "loss_fd", "loss_memory", "loss_fg_feature", "loss_cls"}
    assert expected <= set(losses), set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_train_step_updates_params(setup):
    model, batch, variables = setup
    det_cfg = DetLossConfig(num_classes=10)
    sched = step_lr_schedule(2e-4, warmup_iters=10, iters_per_epoch=100)
    tx = make_optimizer(variables["params"], sched)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_train_step(model, det_cfg, use_dropout=False, donate=False)
    new_state, losses = step(state, batch)
    assert np.isfinite(float(losses["loss"]))
    # head params moved
    p0 = variables["params"]["bbox_head"]["cls_branch"]["kernel"]
    p1 = new_state.params["bbox_head"]["cls_branch"]["kernel"]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # frozen stage-1 params did not move
    f0 = variables["params"]["backbone"]["layer1_block0"]["conv1"]["kernel"]
    f1 = new_state.params["backbone"]["layer1_block0"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))


def test_incremental_grads_flow_through_distills(setup):
    """The corr/fg losses must produce nonzero grads into the student."""
    model, batch, variables = setup
    det_cfg = DetLossConfig(num_classes=10)
    distill_cfg = DistillConfig.from_flags(
        cates_distill="hard + teacher-first",
        feats_distill="corr + fg_info + decode_v1", num_prev=5)

    def loss_fn(params):
        losses = compute_losses(
            model, {"params": params, "batch_stats": variables.get(
                "batch_stats", {})}, batch, det_cfg,
            teacher_variables=variables, distill_cfg=distill_cfg,
            teacher_score_thr=-1.0, teacher_max_per_img=10)
        return losses["loss_corr"] + losses["loss_fg_feature"]

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = jnp.sqrt(sum(jnp.sum(g * g) for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0

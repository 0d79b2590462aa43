"""Vanilla Deformable-DETR family: base / box refine / two-stage.

Decode-parity pins for the refine chain use the reference's zero-init
invariants (deformable_detr_head.init_weights): reg-out layers start at
kernel=0 with bias 0 (branch 0: wh bias -2 unless two-stage), so at init
  * refine: bbox_preds[0] = (init_ref, sigmoid(-2)) and every later layer
    reproduces the previous layer's prediction exactly (tmp=0 + inv_sig of
    the detached refined ref);
  * two-stage: every layer's prediction equals the sigmoided top-k encoder
    proposals, whose wh are the 0.05 * 2^lvl anchor ladder.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dskd_tpu.models.deformable_detr import (DDETRLossConfig,
                                             DeformableDETR,
                                             deformable_detr_get_bboxes,
                                             deformable_detr_loss)

B, HW, NC, Q = 2, 64, 6, 8


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.array([[64, 50], [48, 64]], np.int32))
    xy = rng.rand(B, 3, 2).astype(np.float32) * 25
    wh = rng.rand(B, 3, 2).astype(np.float32) * 15 + 5
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, NC, (B, 3)).astype(np.int32))
    valid = jnp.asarray(np.tile(np.arange(3) < 2, (B, 1)))
    return images, img_hw, gt, labels, valid


def _model(**kw):
    return DeformableDETR(num_classes=NC, num_query=Q, depth=18,
                          num_encoder_layers=1, num_decoder_layers=2,
                          dropout=0.0, remat=False, **kw)


@pytest.mark.parametrize("refine,two_stage", [(False, False),
                                              (True, False), (True, True)])
def test_forward_loss_decode(refine, two_stage):
    images, img_hw, gt, labels, valid = _inputs()
    model = _model(with_box_refine=refine, as_two_stage=two_stage)
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(variables, images, img_hw)
    assert out.head.cls_scores.shape == (2, B, Q, NC)
    assert out.head.bbox_preds.shape == (2, B, Q, 4)
    assert np.isfinite(np.asarray(out.head.bbox_preds)).all()
    if two_stage:
        S = out.head.enc_cls_scores.shape[1]
        assert out.head.enc_bbox_preds.shape == (B, S, 4)

    losses = deformable_detr_loss(out.head, gt, labels, valid, img_hw,
                                  DDETRLossConfig(num_classes=NC))
    expect = {"loss_cls", "loss_bbox", "loss_iou", "d0.loss_cls"}
    if two_stage:
        expect |= {"enc.loss_cls", "enc.loss_bbox", "enc.loss_iou"}
    assert expect <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    d = deformable_detr_get_bboxes(out.head, img_hw, score_thr=-1.0,
                                   max_per_img=5)
    assert d["bboxes"].shape == (B, 5, 4)
    assert float(d["bboxes"].min()) >= 0


def test_refine_init_decode_invariants():
    """Zero-init reg branches: layer l+1's prediction == layer l's
    (detached refined ref), and wh start at sigmoid(-2)."""
    images, img_hw, _, _, _ = _inputs()
    model = _model(with_box_refine=True)
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(variables, images, img_hw)
    bp = np.asarray(out.head.bbox_preds)
    s2 = 1.0 / (1.0 + np.exp(2.0))
    np.testing.assert_allclose(bp[0, ..., 2:], s2, rtol=1e-5)
    np.testing.assert_allclose(bp[1], bp[0], rtol=1e-5, atol=1e-6)


def test_two_stage_init_proposal_ladder():
    """Zero-init: predictions equal the top-k encoder proposals; valid
    proposal wh come from the 0.05 * 2^lvl anchor ladder."""
    images, img_hw, _, _, _ = _inputs()
    model = _model(with_box_refine=True, as_two_stage=True)
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(variables, images, img_hw)
    bp = np.asarray(out.head.bbox_preds)
    np.testing.assert_allclose(bp[1], bp[0], rtol=1e-5, atol=1e-6)
    wh = bp[0][..., 2:]
    ladder = np.array([0.05 * 2 ** l for l in range(4)])
    dist = np.abs(wh[..., None] - ladder).min(-1)
    np.testing.assert_allclose(dist, 0.0, atol=1e-6)
    # enc proposals on valid tokens also sit on the ladder
    ev = np.asarray(out.head.enc_token_valid)
    ewh = np.asarray(out.head.enc_bbox_preds)[..., 2:][ev]
    np.testing.assert_allclose(
        np.abs(ewh[..., None] - ladder).min(-1), 0.0, atol=1e-6)


def test_refine_train_step_grads():
    """One family train step for the refine variant: finite losses and
    nonzero grads into a per-layer reg branch."""
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    images, img_hw, gt, labels, valid = _inputs(1)
    model = _model(with_box_refine=True, as_two_stage=True)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="deformable_detr", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    tx = make_optimizer(variables["params"], lambda i: 1e-4)
    # snapshot BEFORE stepping: the jitted step donates the state buffers
    old = np.asarray(
        variables["params"]["bbox_head"]["cls_branch1"]["kernel"])
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("deformable_detr", model, cfg,
                                  num_prev=0, has_teacher=False,
                                  use_dropout=False)
    new_state, losses = step(state, Batch(images, img_hw, gt, labels,
                                          valid))
    assert np.isfinite(float(losses["loss"]))
    # per-layer branch 1 must have moved (it only exists when refining)
    new = np.asarray(new_state.params["bbox_head"]["cls_branch1"]["kernel"])
    assert float(np.abs(new - old).max()) > 0

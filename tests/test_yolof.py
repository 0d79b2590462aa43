"""YOLOF family tests: anchors/coder oracles, uniform assigner invariants,
forward + loss + distill menu on tiny shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dskd_tpu.core.anchors import (base_anchors, bbox2delta, delta2bbox,
                                   grid_anchors)
from dskd_tpu.core.uniform_assigner import uniform_assign
from dskd_tpu.models.yolof import (YOLOF, YOLOFDistillConfig,
                                   yolof_compute_losses)
from dskd_tpu.models.yolof_head import (YOLOFLossConfig, yolof_anchors,
                                        yolof_get_bboxes)
from dskd_tpu.train.step import Batch


def test_base_anchors_yolof_sizes():
    base = base_anchors(32, scales=(1, 2, 4, 8, 16), ratios=(1.0,))
    sizes = base[:, 2] - base[:, 0]
    np.testing.assert_allclose(sizes, [32, 64, 128, 256, 512])
    # centered at origin
    np.testing.assert_allclose(base[:, :2], -base[:, 2:])


def test_grid_anchor_layout():
    base = base_anchors(32, scales=(1,), ratios=(1.0,))
    anchors = np.asarray(grid_anchors((2, 3), 32, base))
    assert anchors.shape == (6, 4)
    # row-major: position (0, 1) is the second anchor
    np.testing.assert_allclose(anchors[1], [32 - 16, -16, 32 + 16, 16])


def test_delta_coder_roundtrip():
    rng = np.random.RandomState(0)
    anchors = rng.rand(20, 4).astype(np.float32) * 100
    anchors[:, 2:] += anchors[:, :2] + 10
    gt = anchors + rng.randn(20, 4).astype(np.float32) * 3
    deltas = bbox2delta(jnp.array(anchors), jnp.array(gt))
    back = delta2bbox(jnp.array(anchors), deltas)
    np.testing.assert_allclose(np.asarray(back), gt, atol=1e-3)


def test_delta_coder_ctr_clamp():
    anchors = jnp.array([[0.0, 0.0, 100.0, 100.0]])
    # huge center shift: dxy*wh = 1000 -> clamped to 32
    deltas = jnp.array([[10.0, 0.0, 0.0, 0.0]])
    out = np.asarray(delta2bbox(anchors, deltas, add_ctr_clamp=True,
                                ctr_clamp=32.0))
    np.testing.assert_allclose(out[0], [50 + 32 - 50, 0, 50 + 32 + 50, 100])


def test_uniform_assign_invariants():
    rng = np.random.RandomState(1)
    N, G = 64, 3
    anchors = np.zeros((N, 4), np.float32)
    grid = rng.rand(N, 2) * 200
    anchors[:, :2] = grid - 16
    anchors[:, 2:] = grid + 16
    preds = anchors + rng.randn(N, 4).astype(np.float32) * 4
    gt = np.array([[10, 10, 60, 60], [100, 100, 160, 160],
                   [0, 0, 0, 0]], np.float32)
    labels = np.array([2, 5, 0], np.int32)
    valid = np.array([True, True, False])

    res = uniform_assign(jnp.array(preds), jnp.array(anchors),
                         jnp.array(gt), jnp.array(labels), jnp.array(valid),
                         num_classes=10)
    lab = np.asarray(res.labels)
    w = np.asarray(res.label_weights)
    assert lab.shape == (N,)
    # positives carry the right labels
    assert set(lab[lab < 10].tolist()) <= {2, 5}
    # ignored anchors have zero weight
    assert ((w == 0) | (w == 1)).all()
    # candidates of the padded gt are masked out of the bbox loss
    pos_mask = np.asarray(res.cand_pos_mask)
    cand_gt = np.asarray(res.cand_gt_idx)
    assert not pos_mask[cand_gt == 2].any()


@pytest.fixture(scope="module")
def yolof_setup():
    model = YOLOF(depth=18, num_classes=10)
    B, H, W = 2, 64, 64
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.1)
    img_hw = jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    xy = rng.rand(B, 6, 2).astype(np.float32) * 30
    wh = rng.rand(B, 6, 2).astype(np.float32) * 25 + 8
    batch = Batch(images, img_hw,
                  jnp.asarray(np.concatenate([xy, xy + wh], -1)),
                  jnp.asarray(rng.randint(0, 10, (B, 6)).astype(np.int32)),
                  jnp.asarray(np.tile(np.arange(6) < 3, (B, 1))))
    return model, variables, batch


def test_yolof_forward_shapes(yolof_setup):
    model, variables, batch = yolof_setup
    out = model.apply(variables, batch.images, batch.img_hw)
    B, H, W, _ = batch.images.shape
    assert out.head.cls_scores.shape == (B, H // 32, W // 32, 5 * 10)
    assert out.head.bbox_preds.shape == (B, H // 32, W // 32, 5 * 4)
    assert out.neck_feat.shape == (B, H // 32, W // 32, 512)


def test_yolof_losses_and_distill(yolof_setup):
    model, variables, batch = yolof_setup
    out = model.apply(variables, batch.images, batch.img_hw)
    anchors = yolof_anchors(out.head.feat_hw)
    cfg = YOLOFLossConfig(num_classes=10)
    losses = yolof_compute_losses(out, anchors, batch, cfg)
    assert {"loss_cls", "loss_bbox"} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    dcfg = YOLOFDistillConfig.from_flags(
        cates_distill="hard + soft", locat_distill="bbox",
        feats_distill="kldv")
    losses = yolof_compute_losses(out, anchors, batch, cfg,
                                  teacher_out=out, distill_cfg=dcfg,
                                  teacher_score_thr=-1.0,
                                  teacher_max_per_img=10)
    assert {"loss_kd", "loss_ld_bbox", "loss_fd"} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_yolof_get_bboxes_static(yolof_setup):
    model, variables, batch = yolof_setup
    out = model.apply(variables, batch.images, batch.img_hw)
    anchors = yolof_anchors(out.head.feat_hw)
    det = yolof_get_bboxes(out.head, anchors, batch.img_hw,
                           score_thr=-1.0, max_per_img=8)
    assert det["bboxes"].shape == (2, 8, 4)
    assert det["keep_qid"].shape == (2, 8)
    # every box within the image
    b = np.asarray(det["bboxes"])
    assert (b >= 0).all() and (b <= 64).all()


def test_yolof_bn_stats_train_and_teacher_frozen(yolof_setup):
    """Train-mode apply must UPDATE neck/head BN running stats (the
    reference trains these BNs: necks/dilated_encoder.py:108 norm_cfg
    requires_grad=True) while the frozen teacher keeps its own."""
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.schedule import step_lr_schedule
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.utils.config import ExperimentConfig, ModelConfig

    model, variables, batch = yolof_setup
    cfg = ExperimentConfig(model=ModelConfig(arch="yolof", num_classes=10,
                                             depth=18))
    tx = make_optimizer(variables["params"],
                        step_lr_schedule(1e-3, iters_per_epoch=10))
    state = TrainState.create(variables["params"],
                              variables["batch_stats"], tx,
                              jax.random.PRNGKey(1))
    teacher_vars = jax.tree.map(jnp.copy, variables)
    # the step donates state buffers — snapshot the stats first
    old_bs = jax.tree.map(jnp.copy, variables["batch_stats"])
    step = make_family_train_step("yolof", model, cfg, num_prev=5,
                                  has_teacher=True)
    new_state, losses = step(state, batch, teacher_vars)
    assert np.isfinite(float(losses["loss"]))

    new_bs = new_state.batch_stats
    # neck BN stats must have moved (batch mean of real activations != 0)
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        old_bs["neck"], new_bs["neck"])
    assert max(jax.tree.leaves(moved)) > 0, moved
    # frozen backbone stats unchanged
    same = jax.tree.map(lambda a, b: bool((a == b).all()),
                        old_bs["backbone"], new_bs["backbone"])
    assert all(jax.tree.leaves(same))
    # the teacher pytree is untouched
    t_same = jax.tree.map(lambda a, b: bool((a == b).all()),
                          teacher_vars["batch_stats"], old_bs)
    assert all(jax.tree.leaves(t_same))

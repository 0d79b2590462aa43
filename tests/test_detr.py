"""Vanilla DETR family tests."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.detr import DETR, DETRLossConfig, detr_detection_loss


def test_detr_forward_and_loss():
    model = DETR(num_classes=6, num_query=12, num_encoder_layers=1,
                 num_decoder_layers=2, depth=18, dropout=0.0)
    B, H, W = 2, 64, 64
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.1)
    img_hw = jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(variables, images, img_hw)
    assert out.cls_scores.shape == (2, B, 12, 7)   # C+1 softmax channels
    assert out.bbox_preds.shape == (2, B, 12, 4)

    xy = rng.rand(B, 4, 2).astype(np.float32) * 30
    wh = rng.rand(B, 4, 2).astype(np.float32) * 20 + 5
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, 6, (B, 4)).astype(np.int32))
    valid = jnp.asarray(np.tile(np.arange(4) < 2, (B, 1)))

    losses = detr_detection_loss(out, gt, labels, valid, img_hw,
                                 DETRLossConfig(num_classes=6))
    assert {"loss_cls", "loss_bbox", "loss_iou", "d0.loss_cls"} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_detr_il_distill_menu():
    """DETR_il teacher protocol: out_teacher keep-ids + hard merge + soft-KD
    + kldv memory distill (detectors/detr_il.py:116-154, 291-305)."""
    from dskd_tpu.models.detr import (DETRDistillConfig, detr_compute_losses,
                                      detr_get_bboxes)
    from dskd_tpu.train.step import Batch

    model = DETR(num_classes=6, num_query=12, num_encoder_layers=1,
                 num_decoder_layers=2, depth=18, dropout=0.0)
    B, H, W = 2, 64, 64
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32) * 0.1)
    img_hw = jnp.asarray(np.tile([[H, W]], (B, 1)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(variables, images, img_hw)

    det = detr_get_bboxes(out, img_hw, score_thr=-1.0, max_per_img=4)
    assert det["bboxes"].shape == (B, 4, 4)
    assert det["keep_qid"].shape == (B, 4)
    assert bool(det["valid"].all())   # thr -1 keeps everything
    # boxes inside the image
    assert float(det["bboxes"].min()) >= 0
    assert float(det["bboxes"][..., 2].max()) <= W

    xy = rng.rand(B, 4, 2).astype(np.float32) * 30
    wh = rng.rand(B, 4, 2).astype(np.float32) * 20 + 5
    batch = Batch(images, img_hw,
                  jnp.asarray(np.concatenate([xy, xy + wh], -1)),
                  jnp.asarray(rng.randint(0, 6, (B, 4)).astype(np.int32)),
                  jnp.asarray(np.tile(np.arange(4) < 2, (B, 1))))

    dcfg = DETRDistillConfig.from_flags(cates_distill="hard + soft",
                                        feats_distill="kldv")
    losses = detr_compute_losses(out, batch, DETRLossConfig(num_classes=6),
                                 teacher_out=out, distill_cfg=dcfg,
                                 teacher_score_thr=-1.0,
                                 teacher_max_per_img=4)
    assert {"loss_cls", "loss_kd", "loss_fd"} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    # student == teacher => KD/FD losses are ~0
    assert float(losses["loss_kd"]) < 1e-5
    assert float(losses["loss_fd"]) < 1e-5

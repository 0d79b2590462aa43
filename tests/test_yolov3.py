"""YOLOv3: darknet shapes, responsible-anchor loss, decode roundtrip."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dskd_tpu.models.yolov3 import (YOLOV3, YOLOV3LossConfig,
                                    yolo_level_anchors, yolov3_get_bboxes,
                                    yolov3_loss)


@pytest.fixture(scope="module")
def setup():
    model = YOLOV3(num_classes=5)
    B, S = 1, 128
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, S, S, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[S, S]], (B, 1)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(variables, images, img_hw)
    return model, variables, images, img_hw, out


def test_yolov3_level_shapes(setup):
    _, _, _, _, out = setup
    sizes = [p.shape[1:3] for p in out.preds]
    assert sizes == [(4, 4), (8, 8), (16, 16)]     # strides 32/16/8 at 128
    assert out.preds[0].shape[-1] == 3 * (5 + 5)


def test_yolov3_loss_and_grads(setup):
    model, variables, images, img_hw, out = setup
    rng = np.random.RandomState(1)
    G = 3
    xy = rng.rand(1, G, 2).astype(np.float32) * 60
    wh = rng.rand(1, G, 2).astype(np.float32) * 40 + 15
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, 5, (1, G)).astype(np.int32))
    valid = jnp.asarray(np.ones((1, G), bool))
    cfg = YOLOV3LossConfig(num_classes=5)

    def loss_fn(params):
        o = model.apply({"params": params,
                         "batch_stats": variables["batch_stats"]},
                        images, img_hw)
        ld = yolov3_loss(o, gt, labels, valid, cfg)
        return sum(ld.values()), ld

    (total, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total))
    for k in ("loss_xy", "loss_wh", "loss_conf", "loss_cls"):
        assert np.isfinite(float(ld[k])), k
    g = grads["pred0"]["kernel"]
    assert float(jnp.abs(g).max()) > 0


def test_yolov3_decode_recovers_planted_prediction(setup):
    """Plant a confident prediction in one anchor slot; decode matches the
    yolo coder geometry."""
    from dskd_tpu.models.yolov3 import YOLOV3Outputs

    C = 5
    sizes = [(4, 4), (8, 8), (16, 16)]
    preds = [np.full((1, h, w, 3 * (5 + C)), -10.0, np.float32)
             for h, w in sizes]
    # level 0 (stride 32), cell (1, 2), anchor 0 (116x90)
    slot = 0 * (5 + C)
    preds[0][0, 1, 2, slot + 0] = 0.0     # sigmoid -> 0.5: cell center x
    preds[0][0, 1, 2, slot + 1] = 0.0     # cell center y
    preds[0][0, 1, 2, slot + 2] = 0.0     # log-wh 0 -> anchor size
    preds[0][0, 1, 2, slot + 3] = 0.0
    preds[0][0, 1, 2, slot + 4] = 10.0    # objectness
    preds[0][0, 1, 2, slot + 5 + 3] = 10.0   # class 3
    out = YOLOV3Outputs(tuple(jnp.asarray(p) for p in preds), ())
    det = yolov3_get_bboxes(out, jnp.asarray([[128, 128]], jnp.int32),
                            score_thr=0.05, max_per_img=5)
    assert int(det["labels"][0, 0]) == 3
    cx, cy = (2 + 0.5) * 32, (1 + 0.5) * 32
    np.testing.assert_allclose(
        np.asarray(det["bboxes"])[0, 0],
        [max(cx - 58, 0), max(cy - 45, 0),
         min(cx + 58, 128), min(cy + 45, 128)], atol=1e-2)


def test_yolov3_mobilenetv2_variant():
    """yolov3_mobilenetv2 recipe: MobileNetV2 taps (2, 4, 6) with leaky
    acts + trainable BN, 96-channel neck/head; BN stats update under
    train=True (configs/yolo/yolov3_mobilenetv2_mstrain-416_300e_coco.py)."""
    model = YOLOV3(num_classes=5, backbone="mobilenet_v2")
    B, S = 1, 128
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, S, S, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[S, S]], (B, 1)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(variables, images, img_hw)
    sizes = [p.shape[1:3] for p in out.preds]
    assert sizes == [(4, 4), (8, 8), (16, 16)]
    assert out.preds[0].shape[-1] == 3 * (5 + 5)
    # neck/head live at 96 channels (mbv2 out_channels=[96]*3)
    p = variables["params"]
    assert p["neck5_0_conv"]["kernel"].shape[-1] == 96
    assert p["head0_conv"]["kernel"].shape[-1] == 96
    # backbone taps: stage3 (C3, 32ch in), stage5/7 deeper; stem is mbv2
    assert "stage1_block0" in p["backbone"]
    # trainable BN: batch_stats exist and CHANGE under train=True
    assert "batch_stats" in variables
    _, upd = model.apply(variables, images, img_hw, train=True,
                         mutable=["batch_stats"])
    before = variables["batch_stats"]["backbone"]["stem_bn"]["bn"]["mean"]
    after = upd["batch_stats"]["backbone"]["stem_bn"]["bn"]["mean"]
    assert float(jnp.abs(after - before).max()) > 0

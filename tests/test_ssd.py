"""SSD300: level shapes, anchors, hard-negative mining, loss/decode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dskd_tpu.models.ssd import (SSD, SSDLossConfig, ssd_anchors,
                                 ssd_detection_loss, ssd_get_bboxes,
                                 ssd_level_anchors)


def test_level_anchor_counts_and_sizes():
    a0 = np.asarray(ssd_level_anchors(0))
    a1 = np.asarray(ssd_level_anchors(1))
    assert a0.shape == (4, 4) and a1.shape == (6, 4)
    # SSDAnchorGenerator centers at stride/2 (anchor_generator.py:503):
    # level 0 stride 8 -> center 4; first anchor is the min_size square
    np.testing.assert_allclose(a0[0], [4 - 10.5, 4 - 10.5,
                                       4 + 10.5, 4 + 10.5])
    # second is the geometric-mean square sqrt(21*45)
    s = np.sqrt(21 * 45) / 2
    np.testing.assert_allclose(a0[1], [4 - s, 4 - s, 4 + s, 4 + s],
                               rtol=1e-5)
    # level 5 (stride 300, one cell) is centered on the 300 image
    a5 = np.asarray(ssd_level_anchors(5))
    np.testing.assert_allclose(a5[0], [150 - 130.5, 150 - 130.5,
                                       150 + 130.5, 150 + 130.5])


@pytest.fixture(scope="module")
def setup():
    model = SSD(num_classes=6)
    B, S = 1, 300
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, S, S, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[S, S]], (B, 1)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(variables, images, img_hw)
    return model, variables, images, img_hw, out


def test_ssd300_level_shapes(setup):
    _, _, _, _, out = setup
    sizes = [c.shape[1:3] for c in out.cls_scores]
    assert sizes == [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    assert out.cls_scores[0].shape[-1] == 4 * 7     # A=4, C+1=7
    assert out.cls_scores[1].shape[-1] == 6 * 7


def test_ssd_loss_hard_negative_mining(setup):
    model, variables, images, img_hw, out = setup
    sizes = [c.shape[1:3] for c in out.cls_scores]
    anchors = ssd_anchors(sizes, input_size=300)
    assert anchors.shape[0] == sum(
        h * w * a for (h, w), a in zip(sizes, (4, 6, 6, 6, 4, 4)))

    rng = np.random.RandomState(1)
    G = 4
    xy = rng.rand(1, G, 2).astype(np.float32) * 150
    wh = rng.rand(1, G, 2).astype(np.float32) * 100 + 30
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, 6, (1, G)).astype(np.int32))
    valid = jnp.asarray(np.ones((1, G), bool))
    cfg = SSDLossConfig(num_classes=6)

    ld = ssd_detection_loss(out, anchors, gt, labels, valid, cfg)
    assert np.isfinite(float(ld["loss_cls"]))
    assert np.isfinite(float(ld["loss_bbox"]))

    def loss_fn(params):
        o = model.apply({"params": params}, images, img_hw)
        d = ssd_detection_loss(o, anchors, gt, labels, valid, cfg)
        return d["loss_cls"] + d["loss_bbox"]

    grads = jax.grad(loss_fn)(variables["params"])
    g = grads["cls_conv0"]["kernel"]
    assert float(jnp.abs(g).max()) > 0
    # L2Norm scale param exists and receives gradient
    g2 = grads["backbone"]["l2norm"]["scale"]
    assert float(jnp.abs(g2).max()) > 0


def test_ssd_get_bboxes(setup):
    _, _, _, img_hw, out = setup
    sizes = [c.shape[1:3] for c in out.cls_scores]
    anchors = ssd_anchors(sizes, input_size=300)
    det = ssd_get_bboxes(out, anchors, img_hw, score_thr=0.0,
                         nms_pre=200, max_per_img=20, input_size=300)
    assert det["bboxes"].shape == (1, 20, 4)
    b = np.asarray(det["bboxes"])
    assert b.min() >= 0 and b.max() <= 300

    # 6-level outputs are ambiguous (SSD300 vs SSDLite-320): inferring
    # the variant must fail loudly instead of decoding with wrong anchors
    import pytest
    with pytest.raises(ValueError):
        ssd_anchors(sizes)


def test_ssd512_anchor_ladder():
    """SSD512 COCO ladder (anchor_generator.py:536-541): basesize range
    (0.1, 0.9), step 16 over 10..90, 4%/10% level-0 insert."""
    from dskd_tpu.models.ssd import SIZE_SPECS
    spec = SIZE_SPECS[512]
    assert spec["min_sizes"] == (20, 51, 133, 215, 296, 378, 460)
    assert spec["max_sizes"] == (51, 133, 215, 296, 378, 460, 542)
    # level 0: min square centered at stride/2 = 4
    a0 = np.asarray(ssd_level_anchors(0, 512))
    assert a0.shape == (4, 4)
    np.testing.assert_allclose(a0[0], [4 - 10, 4 - 10, 4 + 10, 4 + 10])
    # level 4 carries the (2, 3) ratio pair -> 6 anchors (vs 4 at 300)
    assert np.asarray(ssd_level_anchors(4, 512)).shape == (6, 4)
    # level 6 (stride 512, one cell) centered on the 512 image
    a6 = np.asarray(ssd_level_anchors(6, 512))
    np.testing.assert_allclose(a6[0], [256 - 230, 256 - 230,
                                       256 + 230, 256 + 230])
    # total prior count matches the canonical SSD512 24564
    sizes = [(64, 64), (32, 32), (16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    assert ssd_anchors(sizes).shape[0] == 24564


def test_ssd512_level_shapes_and_decode():
    """7 detection levels 64..1 at 512 input (ssd_neck extras incl. the
    last kernel-4 stride-1 block) and a finite decode."""
    model = SSD(num_classes=6, input_size=512)
    B, S = 1, 512
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, S, S, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[S, S]], (B, 1)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(variables, images, img_hw)
    sizes = [c.shape[1:3] for c in out.cls_scores]
    assert sizes == [(64, 64), (32, 32), (16, 16), (8, 8), (4, 4),
                     (2, 2), (1, 1)]
    per_a = (4, 6, 6, 6, 6, 4, 4)
    for c, a in zip(out.cls_scores, per_a):
        assert c.shape[-1] == a * 7
    anchors = ssd_anchors(sizes)
    det = ssd_get_bboxes(out, anchors, img_hw, score_thr=0.0,
                         nms_pre=200, max_per_img=20)
    assert det["bboxes"].shape == (1, 20, 4)
    b = np.asarray(det["bboxes"])
    assert b.min() >= 0 and b.max() <= 512


def test_ssdlite_mobilenetv2_variant():
    """SSDLite (ssdlite_mobilenetv2_scratch_600e_coco.py): MobileNetV2
    taps (4, 7), depthwise extras to (512, 256, 256, 128), per-branch
    depthwise head + 1x1 preds, A=6 everywhere, trainable BN."""
    model = SSD(num_classes=6, input_size=320)
    B, S = 1, 320
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, S, S, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[S, S]], (B, 1)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(variables, images, img_hw)
    sizes = [c.shape[1:3] for c in out.cls_scores]
    assert sizes == [(20, 20), (10, 10), (5, 5), (3, 3), (2, 2), (1, 1)]
    # A=6 on every level (ratios (2, 3) throughout); feature channels
    # follow the neck row (96, 1280, 512, 256, 256, 128)
    for c in out.cls_scores:
        assert c.shape[-1] == 6 * 7
    assert [f.shape[-1] for f in out.neck_feats] == [96, 1280, 512, 256,
                                                     256, 128]
    # BN stats update under train=True (scratch recipe, no norm_eval)
    assert "batch_stats" in variables
    _, upd = model.apply(variables, images, img_hw, train=True,
                         mutable=["batch_stats"])
    b0 = variables["batch_stats"]["extra0_pw_bn"]["bn"]["mean"]
    a0 = upd["batch_stats"]["extra0_pw_bn"]["bn"]["mean"]
    assert float(jnp.abs(a0 - b0).max()) > 0
    # explicit-table anchors: 6 per cell, stride-107 level included
    anchors = ssd_anchors(sizes, input_size=320)
    assert anchors.shape[0] == 6 * sum(h * w for h, w in sizes)
    a3 = np.asarray(ssd_level_anchors(3, 320))   # stride 107, min 202
    np.testing.assert_allclose(a3[0], [53.5 - 101, 53.5 - 101,
                                       53.5 + 101, 53.5 + 101])
    det = ssd_get_bboxes(out, anchors, img_hw, score_thr=0.0,
                         nms_pre=200, max_per_img=20, input_size=320)
    assert det["bboxes"].shape == (1, 20, 4)

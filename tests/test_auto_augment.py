"""AutoAugment geometric/enhance ops: golden box geometry + pipeline hook."""
import numpy as np

from dskd_tpu.data.auto_augment import (auto_augment, brightness, color,
                                        contrast, equalize, rotate, shear,
                                        translate)


def _img(h=40, w=60):
    rng = np.random.RandomState(0)
    return (rng.rand(h, w, 3) * 255).astype(np.float32)


def test_translate_boxes_golden():
    boxes = np.array([[10, 10, 20, 20]], np.float32)
    labels = np.array([1])
    img, b, l = translate(_img(), boxes, labels, 5.0, axis="x")
    np.testing.assert_allclose(b, [[15, 10, 25, 20]])
    img, b, l = translate(_img(), boxes, labels, -8.0, axis="y")
    np.testing.assert_allclose(b, [[10, 2, 20, 12]])


def test_translate_drops_offscreen_box():
    boxes = np.array([[0, 0, 8, 8], [30, 10, 40, 20]], np.float32)
    labels = np.array([1, 2])
    _, b, l = translate(_img(), boxes, labels, -10.0, axis="x")
    assert len(b) == 1 and l.tolist() == [2]
    np.testing.assert_allclose(b, [[20, 10, 30, 20]])


def test_shear_boxes_golden():
    # x-shear: x' = x + m*y — the enclosing box spans the sheared corners
    boxes = np.array([[10, 10, 20, 20]], np.float32)
    _, b, _ = shear(_img(), boxes, np.array([1]), 0.5, axis="x")
    np.testing.assert_allclose(b, [[15, 10, 30, 20]])


def test_rotate_90_roundtrip_area():
    # rotating a centered square by 90 deg about the center keeps its box
    h = w = 41
    boxes = np.array([[15, 15, 25, 25]], np.float32)
    _, b, _ = rotate(np.zeros((h, w, 3), np.float32), boxes,
                     np.array([0]), 90.0)
    np.testing.assert_allclose(b, boxes, atol=1e-3)


def test_enhance_ops_bounds_and_identity():
    img = _img()
    np.testing.assert_allclose(brightness(img, 1.0), img, atol=1e-3)
    np.testing.assert_allclose(contrast(img, 1.0), img, atol=1e-3)
    np.testing.assert_allclose(color(img, 1.0), img, atol=1e-3)
    for out in (brightness(img, 1.9), contrast(img, 0.1), color(img, 0.1),
                equalize(img)):
        assert out.min() >= 0 and out.max() <= 255
        assert out.shape == img.shape


def test_auto_augment_policy_runs():
    rng = np.random.RandomState(3)
    boxes = np.array([[10, 10, 30, 30], [5, 5, 15, 15]], np.float32)
    labels = np.array([0, 1])
    changed = False
    for _ in range(8):
        img, b, l = auto_augment(_img(), boxes, labels, rng)
        assert img.shape == (40, 60, 3)
        assert len(b) == len(l) <= 2
        if len(b) != 2 or not np.allclose(b, boxes):
            changed = True
    assert changed


def test_auto_augment_in_pipeline():
    from dskd_tpu.data.pipeline import PipelineConfig, preprocess

    img = _img(48, 64)
    boxes = np.array([[8, 8, 30, 30]], np.float32)
    labels = np.array([1])
    cfg = PipelineConfig(img_scale=(64, 64), bucket=(64, 64), max_gt=4,
                         flip_ratio=0.0, auto_augment=True)
    rng = np.random.RandomState(0)
    out = preprocess(img, boxes, labels, cfg, rng, train=True)
    assert out["image"].shape == (64, 64, 3)
    assert out["gt_valid"].sum() <= 1


def test_albu_bridge_gate():
    """Without albumentations installed the bridge raises an informative
    ImportError (the reference has the same optional dependency)."""
    import pytest

    from dskd_tpu.data.albu_bridge import build_albu

    try:
        import albumentations  # noqa: F401
        has_albu = True
    except ImportError:
        has_albu = False
    if has_albu:
        apply = build_albu([dict(type="HorizontalFlip", p=1.0)])
        img = np.zeros((8, 8, 3), np.float32)
        boxes = np.array([[0, 0, 4, 4]], np.float32)
        out, b, l = apply(img, boxes, np.array([1]))
        assert out.shape == img.shape
    else:
        with pytest.raises(ImportError, match="albumentations"):
            build_albu([dict(type="HorizontalFlip", p=1.0)])

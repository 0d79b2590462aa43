"""Golden-geometry tests for Mosaic / MixUp (transforms.py:1948-2443)."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dskd_tpu.data.mix_transforms import PAD_VAL, mixup, mosaic  # noqa: E402


class FixedRng:
    """Deterministic stand-in: uniform() returns fixed values in order."""

    def __init__(self, uniforms, randints=()):
        self.uniforms = list(uniforms)
        self.randints = list(randints)

    def uniform(self, lo, hi=None):
        v = self.uniforms.pop(0)
        return v

    def randint(self, lo, hi=None):
        return self.randints.pop(0)


def test_mosaic_geometry_center_at_scale():
    """center ratio 1.0 puts the mosaic center exactly at (W, H); each
    quadrant gets one image; boxes shift by the paste-crop offset."""
    H = W = 100
    imgs = []
    for v in (10, 60, 110, 160):
        img = np.full((50, 100, 3), v, np.uint8)   # resizes 2x to 100x200
        imgs.append(img)
    box = np.array([[0.0, 0.0, 10.0, 10.0]], np.float32)
    lab = np.array([3], np.int32)
    samples = [(im, box.copy(), lab.copy()) for im in imgs]

    rng = FixedRng(uniforms=[1.0, 1.0])      # cx = W, cy = H
    canvas, boxes, labels = mosaic(samples, (H, W), rng)
    assert canvas.shape == (200, 200, 3)
    # keep-ratio: min(100/50, 100/100) = 1 -> images stay 50x100
    # top-left quadrant: paste region ends at (cx, cy) = (100, 100)
    assert canvas[99, 99, 0] == 10      # img 0 bottom-right corner at center
    assert canvas[99, 100, 0] == 60     # img 1 starts right of center
    assert canvas[100, 99, 0] == 110    # img 2 below-left
    assert canvas[100, 100, 0] == 160   # img 3 below-right
    # area above the 50px-tall images inside each quadrant is pad
    assert canvas[0, 0, 0] == PAD_VAL

    # boxes: img0 pasted at x1=0, y1=50 with crop offset 0 ->
    # shifted by (+0, +50); img3 at (100, 100)
    assert len(boxes) == 4
    got = {tuple(np.round(b).astype(int)) for b in boxes}
    assert (0, 50, 10, 60) in got       # top-left sample
    assert (100, 100, 110, 110) in got  # bottom-right sample
    assert set(labels.tolist()) == {3}


def test_mosaic_drops_degenerate_boxes():
    H = W = 64
    img = np.zeros((64, 64, 3), np.uint8)
    # a box fully left of its quadrant's crop will clip to zero width
    box = np.array([[0.0, 0.0, 1.0, 64.0]], np.float32)
    lab = np.array([0], np.int32)
    samples = [(img, box.copy(), lab.copy()) for _ in range(4)]
    rng = FixedRng(uniforms=[1.5, 1.5])
    canvas, boxes, labels = mosaic(samples, (H, W), rng,
                                   min_bbox_size=2.0)
    assert canvas.shape == (128, 128, 3)
    # top-left image (64x64) pasted at [32..96): its thin box survives;
    # clipping at canvas edges may drop others — all surviving have w > 2
    assert np.all(boxes[:, 2] - boxes[:, 0] > 2.0)


def test_mixup_blend_and_boxes():
    """jit 1.0, no flip, no crop offset: out = 0.5*img + 0.5*retrieved;
    retrieved boxes append unchanged (scale ratio 1)."""
    img = np.full((100, 100, 3), 200, np.uint8)
    boxes = np.array([[5.0, 5.0, 20.0, 20.0]], np.float32)
    labels = np.array([1], np.int32)
    r_img = np.full((100, 100, 3), 0, np.uint8)
    r_boxes = np.array([[10.0, 10.0, 30.0, 30.0]], np.float32)
    r_labels = np.array([2], np.int32)

    rng = FixedRng(uniforms=[1.0, 0.0])     # jit=1.0, flip draw 0.0 (< 0.5
    # threshold means flip only when draw > ratio; 0.0 -> no flip)
    mixed, out_boxes, out_labels = mixup(
        img, boxes, labels, r_img, r_boxes, r_labels, rng,
        dynamic_scale=(100, 100))
    assert mixed[0, 0, 0] == 100            # 0.5*200 + 0.5*0
    assert out_boxes.shape == (2, 4)
    np.testing.assert_allclose(out_boxes[0], boxes[0])
    np.testing.assert_allclose(out_boxes[1], r_boxes[0])
    assert out_labels.tolist() == [1, 2]


def test_mixup_empty_retrieved_is_noop():
    img = np.zeros((50, 50, 3), np.uint8)
    boxes = np.array([[1.0, 1.0, 5.0, 5.0]], np.float32)
    labels = np.array([0], np.int32)
    out, ob, ol = mixup(img, boxes, labels, img.copy(),
                        np.empty((0, 4), np.float32),
                        np.empty((0,), np.int32),
                        FixedRng([1.0, 0.0]))
    assert ob.shape == (1, 4) and ol.tolist() == [0]

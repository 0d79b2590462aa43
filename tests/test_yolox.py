"""YOLOX family: square-IoU loss oracle, YOLOX cosine LR policy, decode.

Parity refs: mmdet losses/iou_loss.py (mode='square'), mmcv
YOLOXLrUpdaterHook, configs/yolox/yolox_s_8x8_300e_coco.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dskd_tpu.core import losses as L
from dskd_tpu.train.schedule import yolox_cosine_schedule


def _torch_square_iou(pred, target, eps=1e-16):
    import torch
    p = torch.as_tensor(np.asarray(pred))
    t = torch.as_tensor(np.asarray(target))
    lt = torch.max(p[:, :2], t[:, :2])
    rb = torch.min(p[:, 2:], t[:, 2:])
    wh = (rb - lt).clamp(min=0)
    ov = wh[:, 0] * wh[:, 1]
    ap = (p[:, 2] - p[:, 0]) * (p[:, 3] - p[:, 1])
    at = (t[:, 2] - t[:, 0]) * (t[:, 3] - t[:, 1])
    ious = ov / (ap + at - ov).clamp(min=eps)
    return (1 - ious**2).numpy()


def test_square_iou_loss_torch_oracle():
    rng = np.random.RandomState(0)
    xy = rng.rand(64, 2).astype(np.float32) * 50
    wh = rng.rand(64, 2).astype(np.float32) * 30 + 2
    pred = np.concatenate([xy, xy + wh], -1)
    jit = rng.randn(64, 4).astype(np.float32) * 4
    target = pred + jit
    target[:, 2:] = np.maximum(target[:, 2:], target[:, :2] + 1)
    ours = L.square_iou_loss(jnp.asarray(pred), jnp.asarray(target),
                             reduction="none")
    ref = _torch_square_iou(pred, target)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)


def test_yolox_cosine_schedule_shape():
    s = yolox_cosine_schedule(0.01, warmup_iters=100, total_iters=1000,
                              last_iters=200, min_lr_ratio=0.05)
    # quadratic warmup: lr(50) = 0.01 * 0.25
    assert np.isclose(float(s(50)), 0.01 * 0.25, rtol=1e-6)
    assert np.isclose(float(s(100)), 0.01, rtol=1e-5)
    # cosine floor reached at total - last, held through the no-aug tail
    assert np.isclose(float(s(800)), 0.01 * 0.05, rtol=1e-5)
    assert np.isclose(float(s(999)), 0.01 * 0.05, rtol=1e-5)
    # monotone non-increasing after warmup
    xs = [float(s(t)) for t in range(100, 1000, 50)]
    assert all(a >= b - 1e-9 for a, b in zip(xs, xs[1:]))


@pytest.mark.slow
def test_yolox_build_step_decode():
    from dskd_tpu.eval.evaluator import make_eval_step
    from dskd_tpu.models.yolox import YOLOX

    m = YOLOX(num_classes=7)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    hw = jnp.asarray([[64, 64]], jnp.int32)
    v = m.init(jax.random.PRNGKey(0), imgs, hw)
    es = make_eval_step(m, arch="yolox", max_per_img=20)
    d = es(v, imgs, hw, jnp.ones((1, 4), jnp.float32))
    assert d.bboxes.shape == (1, 20, 4)
    assert d.labels.max() < 7

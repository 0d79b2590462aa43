"""Matrix NMS vs a numpy oracle of the reference decay math
(core/post_processing/matrix_nms.py:5-121) + auction fallback counter."""
import numpy as np
import jax.numpy as jnp

from dskd_tpu.core.matching import lap_auction
from dskd_tpu.core.postprocess import box_matrix_nms, matrix_nms


def _oracle_decay(ious, labels, scores, kernel, sigma):
    """Reference decay semantics, scores pre-sorted descending."""
    n = len(scores)
    tri = np.triu(np.ones((n, n), bool), 1)
    same = labels[:, None] == labels[None, :]
    decay_iou = np.where(tri & same, ious, 0.0)
    compensate = decay_iou.max(axis=0)                   # per instance
    comp_m = np.broadcast_to(compensate[:, None], (n, n))
    if kernel == "gaussian":
        decay = np.exp(-sigma * decay_iou ** 2) / np.exp(
            -sigma * comp_m ** 2)
    else:
        decay = (1 - decay_iou) / (1 - comp_m)
    coeff = decay.min(axis=0)
    return scores * np.minimum(coeff, 1.0)


def _rand_overlapping(rng, n):
    xy = rng.rand(n, 2) * 40
    wh = rng.rand(n, 2) * 60 + 20
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


def _ious(b):
    x1 = np.maximum(b[:, None, 0], b[None, :, 0])
    y1 = np.maximum(b[:, None, 1], b[None, :, 1])
    x2 = np.minimum(b[:, None, 2], b[None, :, 2])
    y2 = np.minimum(b[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.clip(area[:, None] + area[None, :] - inter, 1e-6,
                           None)


def test_matrix_nms_matches_oracle():
    rng = np.random.RandomState(0)
    for kernel in ("gaussian", "linear"):
        boxes = _rand_overlapping(rng, 24)
        labels = rng.randint(0, 3, 24)
        scores = np.sort(rng.rand(24).astype(np.float32))[::-1].copy()
        ious = _ious(boxes)
        got = np.asarray(matrix_nms(jnp.asarray(ious), jnp.asarray(labels),
                                    jnp.asarray(scores), kernel=kernel))
        expected = _oracle_decay(ious, labels, scores, kernel, 2.0)
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


def test_matrix_nms_decays_duplicates():
    # two near-identical boxes of the same class: the lower-scored one's
    # score must collapse; a different-class twin is untouched
    boxes = np.array([[10, 10, 50, 50], [11, 10, 51, 50],
                      [10.5, 10, 50.5, 50]], np.float32)
    labels = np.array([0, 0, 1])
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    b, s, l, order = box_matrix_nms(jnp.asarray(boxes), jnp.asarray(labels),
                                    jnp.asarray(scores))
    s = np.asarray(s)
    assert s[0] == scores[0]            # top stays
    assert s[1] < 0.25                  # same-class duplicate decayed hard
    assert abs(s[2] - 0.7) < 1e-6       # other class untouched


def test_matrix_nms_invalid_masked():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    b, s, l, order = box_matrix_nms(
        jnp.asarray(boxes), jnp.asarray([0, 0]),
        jnp.asarray([0.9, 0.8], jnp.float32),
        valid=jnp.asarray([True, False]))
    assert np.asarray(s)[1] == 0.0
    assert np.asarray(s)[0] == np.float32(0.9)


def test_auction_fallback_counter():
    rng = np.random.RandomState(0)
    cost = jnp.asarray(rng.rand(20, 30).astype(np.float32))
    sol, n_fb = lap_auction(cost, with_stats=True)
    assert int(n_fb) == 0                        # healthy costs converge
    assert len(set(np.asarray(sol).tolist())) == 20
    # force the fallback: zero iterations leaves every row unassigned
    sol2, n_fb2 = lap_auction(cost, max_iters=0, with_stats=True)
    assert int(n_fb2) == 20
    assert len(set(np.asarray(sol2).tolist())) == 20   # still one-to-one

import jax.numpy as jnp
import numpy as np
import pytest

from dskd_tpu.core.boxes import (bbox_cxcywh_to_xyxy, bbox_overlaps,
                                 bbox_xyxy_to_cxcywh)


def _np_iou(a, b):
    """Numpy oracle for pairwise IoU, mirroring mmdet bbox_overlaps."""
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(
        a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(
        b[:, 3] - b[:, 1], 0, None)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-6)
    return inter / union


def test_roundtrip():
    rng = np.random.RandomState(0)
    xyxy = rng.rand(32, 4).astype(np.float32)
    xyxy[:, 2:] += xyxy[:, :2]
    out = bbox_cxcywh_to_xyxy(bbox_xyxy_to_cxcywh(jnp.array(xyxy)))
    np.testing.assert_allclose(np.asarray(out), xyxy, atol=1e-6)


def test_iou_against_numpy_oracle():
    rng = np.random.RandomState(1)
    a = rng.rand(17, 4).astype(np.float32) * 100
    b = rng.rand(9, 4).astype(np.float32) * 100
    a[:, 2:] += a[:, :2]
    b[:, 2:] += b[:, :2]
    got = np.asarray(bbox_overlaps(jnp.array(a), jnp.array(b)))
    np.testing.assert_allclose(got, _np_iou(a, b), rtol=1e-5, atol=1e-6)


def test_giou_known_values():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[0.0, 0.0, 10.0, 10.0], [10.0, 10.0, 20.0, 20.0]])
    g = np.asarray(bbox_overlaps(a, b, mode="giou"))
    assert g[0, 0] == pytest.approx(1.0, abs=1e-5)
    # disjoint, enclosing box 20x20=400, union 200 -> giou = 0 - 200/400
    assert g[0, 1] == pytest.approx(-0.5, abs=1e-5)


def test_aligned_matches_pairwise_diag():
    rng = np.random.RandomState(2)
    a = rng.rand(8, 4).astype(np.float32) * 50
    a[:, 2:] += a[:, :2]
    b = rng.rand(8, 4).astype(np.float32) * 50
    b[:, 2:] += b[:, :2]
    pair = np.asarray(bbox_overlaps(jnp.array(a), jnp.array(b)))
    alig = np.asarray(bbox_overlaps(jnp.array(a), jnp.array(b),
                                    is_aligned=True))
    np.testing.assert_allclose(alig, np.diag(pair), rtol=1e-5)

"""Tiled-exact NMS == sequential-scan NMS, bit-for-bit on the keep mask.

The tiled decomposition (core/postprocess.py `_nms_keep_tiled`) replaces
the n-iteration greedy scan with n/tile tile passes + an intra-tile
fixpoint; greedy NMS semantics (mmcv nms CUDA kernel order) must be
preserved exactly, including suppress-then-revive chains."""
import numpy as np
import jax.numpy as jnp
import pytest

from dskd_tpu.core.postprocess import (_nms_keep_scan, _nms_keep_tiled,
                                       batched_nms)


def _rand_boxes(n, seed, span=200.0, cluster=8.0):
    """Clustered boxes: many high-IoU pairs to force deep suppression."""
    rng = np.random.RandomState(seed)
    centers = rng.rand(max(n // 20, 1), 2) * span
    pick = centers[rng.randint(0, len(centers), n)]
    xy = pick + rng.randn(n, 2) * cluster
    wh = rng.rand(n, 2) * 30 + 5
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


@pytest.mark.parametrize("n,tile", [(700, 256), (1024, 512), (1500, 512),
                                    (5000, 512), (513, 512)])
def test_tiled_matches_scan_random(n, tile):
    rng = np.random.RandomState(n)
    boxes = jnp.asarray(_rand_boxes(n, seed=n))
    valid = jnp.asarray(rng.rand(n) > 0.1)
    # score-sorted on entry (batched_nms sorts before calling)
    keep_scan = np.asarray(_nms_keep_scan(boxes, valid, 0.5))
    keep_tile = np.asarray(_nms_keep_tiled(boxes, valid, 0.5, tile=tile))
    np.testing.assert_array_equal(keep_scan, keep_tile)
    assert keep_scan.sum() > 0


def test_tiled_revival_chain():
    """A suppresses B, B would suppress C: C must survive (revive), and
    the chain alternates across a tile boundary."""
    # overlapping ladder: box i overlaps i+1 at IoU 7/13 > 0.5, but
    # not i+2 (4/16), so greedy keeps every other box
    n, tile = 12, 4
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        boxes[i] = [i * 3.0, 0.0, i * 3.0 + 10.0, 10.0]
    valid = jnp.ones((n,), bool)
    b = jnp.asarray(boxes)
    keep_scan = np.asarray(_nms_keep_scan(b, valid, 0.5))
    keep_tile = np.asarray(_nms_keep_tiled(b, valid, 0.5, tile=tile))
    np.testing.assert_array_equal(keep_scan, keep_tile)
    # the ladder keeps every other box: 0, 2, 4, ...
    assert keep_scan[0] and not keep_scan[1] and keep_scan[2]


def test_batched_nms_tiled_vs_scan_end_to_end(monkeypatch):
    """Full batched_nms (offset trick + sort + compaction) agrees between
    the tiled default and the DSKD_NMS_TILED=0 scan at n > threshold."""
    n = 1200
    rng = np.random.RandomState(3)
    boxes = jnp.asarray(_rand_boxes(n, seed=4))
    scores = jnp.asarray(rng.rand(n).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 7, n).astype(np.int32))
    valid = jnp.asarray(rng.rand(n) > 0.2)

    monkeypatch.setenv("DSKD_NMS_TILED", "1")
    out_tiled = batched_nms(boxes, scores, labels, 0.6, 50, valid=valid)
    monkeypatch.setenv("DSKD_NMS_TILED", "0")
    out_scan = batched_nms(boxes, scores, labels, 0.6, 50, valid=valid)
    for a, b in zip(out_tiled, out_scan):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

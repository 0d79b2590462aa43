"""TBLR / YOLO box coders vs independent numpy oracles + roundtrips."""
import numpy as np
import jax.numpy as jnp

from dskd_tpu.core.coders import (bboxes2tblr, tblr2bboxes, yolo_decode,
                                  yolo_encode)


def _rand_boxes(rng, n):
    xy = rng.rand(n, 2) * 200
    wh = rng.rand(n, 2) * 80 + 8
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


def test_tblr_roundtrip():
    rng = np.random.RandomState(0)
    priors = _rand_boxes(rng, 64)
    gts = _rand_boxes(rng, 64)
    enc = bboxes2tblr(jnp.asarray(priors), jnp.asarray(gts))
    dec = tblr2bboxes(jnp.asarray(priors), enc)
    np.testing.assert_allclose(np.asarray(dec), gts, atol=1e-3)


def test_tblr_oracle():
    # independent re-derivation of tblr_bbox_coder.py:77-121 semantics
    rng = np.random.RandomState(1)
    priors = _rand_boxes(rng, 16)
    gts = _rand_boxes(rng, 16)
    cx = (priors[:, 0] + priors[:, 2]) / 2
    cy = (priors[:, 1] + priors[:, 3]) / 2
    w = priors[:, 2] - priors[:, 0]
    h = priors[:, 3] - priors[:, 1]
    expected = np.stack([
        (cy - gts[:, 1]) / h, (gts[:, 3] - cy) / h,
        (cx - gts[:, 0]) / w, (gts[:, 2] - cx) / w], -1) / 4.0
    got = np.asarray(bboxes2tblr(jnp.asarray(priors), jnp.asarray(gts)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_tblr_vector_normalizer_and_clip():
    rng = np.random.RandomState(2)
    priors = _rand_boxes(rng, 8)
    gts = _rand_boxes(rng, 8)
    norm = (1.0, 2.0, 3.0, 4.0)
    enc = bboxes2tblr(jnp.asarray(priors), jnp.asarray(gts),
                      normalizer=norm)
    dec = tblr2bboxes(jnp.asarray(priors), enc, normalizer=norm,
                      max_hw=(150, 180))
    dec = np.asarray(dec)
    assert dec[:, 0::2].max() <= 180 and dec[:, 1::2].max() <= 150
    unclipped = np.clip(gts, 0, [180, 150, 180, 150])
    np.testing.assert_allclose(dec, unclipped, atol=1e-3)


def test_yolo_roundtrip():
    rng = np.random.RandomState(3)
    stride = 16.0
    # anchors centered on grid cells; GT centers within one cell of the
    # anchor center (the YOLO parameterization's representable range)
    acx = rng.randint(2, 10, 32) * stride + stride / 2
    acy = rng.randint(2, 10, 32) * stride + stride / 2
    aw = rng.rand(32) * 60 + 20
    ah = rng.rand(32) * 60 + 20
    anchors = np.stack([acx - aw / 2, acy - ah / 2,
                        acx + aw / 2, acy + ah / 2], -1).astype(np.float32)
    gcx = acx + (rng.rand(32) - 0.5) * stride * 0.9
    gcy = acy + (rng.rand(32) - 0.5) * stride * 0.9
    gw = aw * np.exp(rng.randn(32) * 0.3)
    gh = ah * np.exp(rng.randn(32) * 0.3)
    gts = np.stack([gcx - gw / 2, gcy - gh / 2,
                    gcx + gw / 2, gcy + gh / 2], -1).astype(np.float32)
    enc = yolo_encode(jnp.asarray(anchors), jnp.asarray(gts), stride)
    # decode consumes post-sigmoid centers; encode emits the cell fraction
    dec = yolo_decode(jnp.asarray(anchors), enc, stride)
    np.testing.assert_allclose(np.asarray(dec), gts, atol=1e-2)


def test_bucketing_roundtrip():
    """Ideal predictions (one-hot labels as logits + target offsets)
    decode back to the encoded GT exactly."""
    from dskd_tpu.core.coders import bbox2bucket, bucket2bbox

    rng = np.random.RandomState(5)
    num_buckets, scale = 14, 1.7
    proposals = _rand_boxes(rng, 32)
    # GT near the proposals (the SABL operating regime)
    gts = proposals + rng.randn(32, 4).astype(np.float32) * 4
    gts[:, 2:] = np.maximum(gts[:, 2:], gts[:, :2] + 4)
    offsets, ow, labels, cw = bbox2bucket(
        jnp.asarray(proposals), jnp.asarray(gts), num_buckets, scale)
    boxes, conf = bucket2bbox(jnp.asarray(proposals), labels * 20.0,
                              offsets, num_buckets, scale)
    np.testing.assert_allclose(np.asarray(boxes), gts, atol=1e-2)
    assert conf.shape == (32,)
    assert np.asarray(conf).min() > 0.5   # one-hot logits -> confident


def test_bucketing_targets_structure():
    from dskd_tpu.core.coders import bbox2bucket

    proposals = jnp.asarray(np.array([[0, 0, 28, 28]], np.float32))
    gts = jnp.asarray(np.array([[2, 2, 26, 26]], np.float32))
    num_buckets, side = 8, 4
    offsets, ow, labels, cw = bbox2bucket(proposals, gts, num_buckets, 1.0)
    assert offsets.shape == (1, 4 * side)
    # one label per side
    assert np.asarray(labels).reshape(4, side).sum(-1).tolist() == [1] * 4
    # top-1 bucket always carries offset weight; topk=2 gives <= 2 per side
    per_side_w = np.asarray(ow).reshape(4, side)
    assert ((per_side_w > 0).sum(-1) >= 1).all()
    assert ((per_side_w > 0).sum(-1) <= 2).all()
    # nearest-bucket offset magnitude is at most half a bucket
    lbl = np.asarray(labels).reshape(4, side).argmax(-1)
    off = np.asarray(offsets).reshape(4, side)
    assert all(abs(off[s, lbl[s]]) <= 0.5 + 1e-6 for s in range(4))


def test_yolo_decode_matches_reference_formula():
    rng = np.random.RandomState(4)
    anchors = _rand_boxes(rng, 16)
    pred = rng.rand(16, 4).astype(np.float32)
    pred[:, 2:] = rng.randn(16, 2) * 0.4
    stride = 8.0
    got = np.asarray(yolo_decode(jnp.asarray(anchors), jnp.asarray(pred),
                                 stride))
    acx = (anchors[:, 0] + anchors[:, 2]) / 2 + (pred[:, 0] - 0.5) * stride
    acy = (anchors[:, 1] + anchors[:, 3]) / 2 + (pred[:, 1] - 0.5) * stride
    hw = (anchors[:, 2] - anchors[:, 0]) / 2 * np.exp(pred[:, 2])
    hh = (anchors[:, 3] - anchors[:, 1]) / 2 * np.exp(pred[:, 3])
    expected = np.stack([acx - hw, acy - hh, acx + hw, acy + hh], -1)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-3)

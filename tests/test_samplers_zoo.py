"""Sampler zoo tail: InstanceBalancedPosSampler, ScoreHLRSampler (ISR-N)
and the nms_match grouping they rely on — random-case loop oracles."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.core.max_iou_assigner import (instance_balanced_sample,
                                            score_hlr_sample)
from dskd_tpu.core.postprocess import nms_match_groups


def _iou(a, b):
    ix1 = max(a[0], b[0]); iy1 = max(a[1], b[1])
    ix2 = min(a[2], b[2]); iy2 = min(a[3], b[3])
    inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / max(ua, 1e-10)


def _nms_match_oracle(boxes, scores, valid, thr):
    """Greedy grouping: repeatedly take the highest-scoring unassigned
    box as keeper; every unassigned box with IoU >= thr joins it."""
    N = len(boxes)
    group = np.full(N, -1, np.int64)
    while True:
        cand = [i for i in range(N) if valid[i] and group[i] < 0]
        if not cand:
            return group
        k = max(cand, key=lambda i: scores[i])
        group[k] = k
        for i in cand:
            if i != k and _iou(boxes[k], boxes[i]) >= thr:
                group[i] = k


def test_nms_match_groups_oracle():
    rng = np.random.RandomState(0)
    for case in range(5):
        N = 40
        xy = rng.rand(N, 2) * 40
        wh = rng.rand(N, 2) * 30 + 4
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = rng.rand(N).astype(np.float32)
        valid = rng.rand(N) < 0.8
        got = np.asarray(nms_match_groups(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            0.5))
        ref = _nms_match_oracle(boxes, scores, valid, 0.5)
        np.testing.assert_array_equal(got, ref, err_msg=f"case {case}")


def test_instance_balanced_positive_quota():
    """3 instances with 20/4/2 positive anchors, 12 positive slots:
    round-robin must take all of the scarce instances (4 and 2) and only
    6 of the abundant one — a uniform sampler would average ~9.2."""
    assigned = np.full(200, -1, np.int64)
    assigned[:20] = 0
    assigned[20:24] = 1
    assigned[24:26] = 2
    assigned[100:150] = -2           # ignored rows sampled never
    counts = []
    for seed in range(10):
        s = instance_balanced_sample(jax.random.PRNGKey(seed),
                                     jnp.asarray(assigned), 48, 0.25)
        idx = np.asarray(s.pos_idx)[np.asarray(s.pos_valid)]
        assert len(idx) == 12
        a = assigned[idx]
        assert (a >= 0).all()
        assert (a == 1).sum() == 4 and (a == 2).sum() == 2
        counts.append((a == 0).sum())
        nidx = np.asarray(s.neg_idx)[np.asarray(s.neg_valid)]
        assert (assigned[nidx] == -1).all()
    assert all(c == 6 for c in counts)


def test_score_hlr_weights_and_selection():
    rng = np.random.RandomState(1)
    N = 60
    assigned = np.where(rng.rand(N) < 0.2, 0, -1).astype(np.int64)
    xy = rng.rand(N, 2) * 50
    wh = rng.rand(N, 2) * 20 + 5
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    score = rng.rand(N).astype(np.float32)
    loss = rng.rand(N).astype(np.float32) + 0.1
    r = score_hlr_sample(jax.random.PRNGKey(0), jnp.asarray(assigned),
                         jnp.asarray(score), jnp.asarray(boxes),
                         jnp.asarray(loss), num=32, pos_fraction=0.25,
                         k=0.5, bias=0.0, score_thr=0.05)
    s, w = r.sample, np.asarray(r.neg_label_weights)
    nidx = np.asarray(s.neg_idx)
    nval = np.asarray(s.neg_valid)
    assert (assigned[nidx[nval]] == -1).all()
    # valid (score > thr) negatives outrank the invalid fill: with 24 neg
    # slots and plenty of valid negatives, every selected slot is valid
    n_valid_neg = ((assigned == -1) & (score > 0.05)).sum()
    if n_valid_neg >= 24:
        assert (score[nidx[nval]] > 0.05).all()
    # weights: positive where selected, zero on dead slots
    assert (w[~nval] == 0).all()
    assert (w[nval] > 0).all()
    # loss-sum renormalization: sum(loss*w) == sum(loss) over selected
    np.testing.assert_allclose((loss[nidx] * nval * w).sum(),
                               (loss[nidx] * nval).sum(), rtol=1e-5)
    # the highest-importance negative (a group keeper with top score)
    # carries the largest weight pre-normalization => weights decrease
    # with importance rank among the hlr slots
    hlr_scores = score[nidx[nval]]
    order = np.argsort(-w[nval])
    # weight order must follow importance: top-weight slot has the
    # globally best (rank-0) importance
    assert hlr_scores[order[0]] == hlr_scores.max() or len(order) == 0


def test_score_hlr_no_valid_negatives_falls_back_uniform():
    assigned = np.full(30, -1, np.int64)
    score = np.zeros(30, np.float32)            # all below score_thr
    boxes = np.tile(np.array([0, 0, 10, 10], np.float32), (30, 1))
    loss = np.ones(30, np.float32)
    r = score_hlr_sample(jax.random.PRNGKey(0), jnp.asarray(assigned),
                         jnp.asarray(score), jnp.asarray(boxes),
                         jnp.asarray(loss), num=16, pos_fraction=0.25)
    w = np.asarray(r.neg_label_weights)
    nval = np.asarray(r.sample.neg_valid)
    assert nval.sum() == 12
    np.testing.assert_allclose(w[nval], 1.0, rtol=1e-5)


def test_rcnn_forward_train_isr_n_path():
    """cfg.isr_n drives sampling through ScoreHLR end-to-end: the loss is
    finite and differs from the random-sampler loss (the weighted CE and
    the importance-based selection both bite)."""
    from dskd_tpu.models.faster_rcnn import (RCNNLossConfig,
                                             rcnn_forward_train)
    rng = np.random.RandomState(0)
    B, S, C = 2, 12, 5
    neck = tuple(jnp.asarray(rng.randn(B, 16 // (2 ** i), 16 // (2 ** i),
                                       8).astype(np.float32))
                 for i in range(4))
    props = jnp.asarray(rng.rand(B, S, 2).repeat(2, -1)
                        .astype(np.float32) * 30)
    props = props.at[..., 2:].add(10.0)
    pvalid = jnp.ones((B, S), bool)
    gtb = jnp.asarray(np.array([[[2, 2, 20, 20], [30, 30, 50, 50]]] * B,
                               np.float32))
    gtl = jnp.zeros((B, 2), jnp.int32)
    gtv = jnp.ones((B, 2), bool)

    w = jnp.asarray(rng.randn(7 * 7 * 8, C + 1 + C * 4)
                    .astype(np.float32) * 0.05)

    def head(f):
        x = f.reshape(f.shape[0], -1) @ w
        return x[:, :C + 1], x[:, C + 1:]

    key = jax.random.PRNGKey(0)
    base = RCNNLossConfig(num_classes=C, num_samples=8)
    hlr = base._replace(isr_n=True)
    l0, _ = rcnn_forward_train(head, neck, props, pvalid, gtb, gtl, gtv,
                               key, base)
    l1, _ = rcnn_forward_train(head, neck, props, pvalid, gtb, gtl, gtv,
                               key, hlr)
    for v in list(l0.values()) + list(l1.values()):
        assert np.isfinite(float(v))
    assert float(l0["loss_cls"]) != float(l1["loss_cls"])

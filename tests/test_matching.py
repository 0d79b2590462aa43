"""Hungarian matcher vs the scipy oracle (the reference's solver)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from dskd_tpu.core.matching import (gfl_match_cost, hungarian_assign, lap_jv)


@pytest.mark.parametrize("r,c,seed", [(5, 5, 0), (8, 20, 1), (1, 7, 2),
                                      (30, 300, 3), (16, 16, 4)])
def test_lap_jv_matches_scipy(r, c, seed):
    rng = np.random.RandomState(seed)
    cost = rng.rand(r, c).astype(np.float32) * 10
    row2col = np.asarray(lap_jv(jnp.array(cost)))
    ri, ci = linear_sum_assignment(cost)
    # optimal assignments may differ; total cost must match exactly
    ours = cost[np.arange(r), row2col].sum()
    assert len(set(row2col.tolist())) == r  # distinct columns
    assert ours == pytest.approx(cost[ri, ci].sum(), rel=1e-5)


def test_lap_jv_padded_rows_do_not_disturb():
    rng = np.random.RandomState(7)
    real = rng.rand(6, 40).astype(np.float32)
    padded = np.concatenate([real, np.zeros((10, 40), np.float32)], 0)
    row2col = np.asarray(lap_jv(jnp.array(padded)))
    ri, ci = linear_sum_assignment(real)
    ours = real[np.arange(6), row2col[:6]].sum()
    assert ours == pytest.approx(real[ri, ci].sum(), rel=1e-5)


def test_lap_jv_vmap():
    rng = np.random.RandomState(8)
    costs = rng.rand(4, 10, 25).astype(np.float32)
    out = np.asarray(jax.vmap(lap_jv)(jnp.array(costs)))
    for b in range(4):
        ri, ci = linear_sum_assignment(costs[b])
        ours = costs[b][np.arange(10), out[b]].sum()
        assert ours == pytest.approx(costs[b][ri, ci].sum(), rel=1e-5)


def test_hungarian_assign_masks():
    rng = np.random.RandomState(9)
    Q, G = 20, 8
    cost = jnp.array(rng.rand(Q, G).astype(np.float32))
    gt_valid = jnp.array([True] * 5 + [False] * 3)
    gt_labels = jnp.array(rng.randint(0, 10, size=G), jnp.int32)
    res = hungarian_assign(cost, gt_valid, gt_labels)
    assert int(res.num_pos) == 5
    assert int(res.pos_mask.sum()) == 5
    # every valid gt matched exactly once
    matched = np.asarray(res.assigned_gt)
    hit = matched[matched >= 0]
    assert sorted(hit.tolist()) == [0, 1, 2, 3, 4]
    # labels agree
    lbl = np.asarray(res.assigned_labels)
    for q in range(Q):
        if matched[q] >= 0:
            assert lbl[q] == int(gt_labels[matched[q]])
        else:
            assert lbl[q] == -1


def test_gfl_cost_vs_reference_formula():
    """Cost stack vs a literal numpy transcription of the assigner."""
    rng = np.random.RandomState(10)
    Q, G, C = 12, 4, 6
    logits = rng.randn(Q, C).astype(np.float32)
    bbox = rng.rand(Q, 4).astype(np.float32) * 0.5 + 0.25
    gt = np.sort(rng.rand(G, 4).astype(np.float32) * 300, axis=-1)[:, [0, 2, 1, 3]]
    labels = rng.randint(0, C, size=G)
    hw = np.array([480.0, 640.0], np.float32)

    got = np.asarray(gfl_match_cost(
        jnp.array(logits), jnp.array(bbox), jnp.array(gt),
        jnp.array(labels), jnp.array(hw)))

    # numpy oracle
    factor = np.array([hw[1], hw[0], hw[1], hw[0]])
    gtn = gt / factor
    gtc = np.stack([(gtn[:, 0] + gtn[:, 2]) / 2, (gtn[:, 1] + gtn[:, 3]) / 2,
                    gtn[:, 2] - gtn[:, 0], gtn[:, 3] - gtn[:, 1]], -1)
    reg = np.abs(bbox[:, None] - gtc[None]).sum(-1) * 5.0

    def xyxy(b):
        return np.stack([b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                         b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], -1)

    def giou(a, b):
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        lt = np.maximum(a[:, None, :2], b[None, :, :2])
        rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        union = np.maximum(area_a[:, None] + area_b[None] - inter, 1e-6)
        elt = np.minimum(a[:, None, :2], b[None, :, :2])
        erb = np.maximum(a[:, None, 2:], b[None, :, 2:])
        ewh = np.clip(erb - elt, 0, None)
        enc = np.maximum(ewh[..., 0] * ewh[..., 1], 1e-6)
        return inter / union - (enc - union) / enc

    pb = xyxy(bbox)
    iou_c = -giou(pb * factor, gt) * 2.0

    def iou(a, b):
        g = giou(a, b)
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        lt = np.maximum(a[:, None, :2], b[None, :, :2])
        rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        union = np.maximum(area_a[:, None] + area_b[None] - inter, 1e-6)
        return inter / union

    score = iou(pb, gtn)
    la = logits[:, labels]
    sig = 1 / (1 + np.exp(-la))
    bce = np.maximum(la, 0) - la * score + np.log1p(np.exp(-np.abs(la)))
    cls_c = bce * np.abs(score - sig) ** 2 * 2.0

    np.testing.assert_allclose(got, cls_c + reg + iou_c, rtol=1e-4, atol=1e-4)


def test_distribution_focal_loss_cost():
    """DFL match cost: per-corner CE at bracketing bins, matched-corner
    average, 1/(G*4) normalization (reference match_cost.py:277-350; its
    own reshape is broken dead code — semantics re-derived)."""
    import torch
    import torch.nn.functional as F

    from dskd_tpu.core.matching import distribution_focal_loss_cost

    rng = np.random.RandomState(0)
    Q, G, n = 5, 3, 17
    pred = rng.randn(Q * 4, n).astype(np.float32)
    tgt = (rng.rand(G * 4) * (n - 1 - 1e-3)).astype(np.float32)

    got = np.asarray(distribution_focal_loss_cost(jnp.asarray(pred),
                                                  jnp.asarray(tgt)))
    # torch oracle with explicit loops (matched corners)
    pred_t, tgt_t = torch.tensor(pred), torch.tensor(tgt)
    want = np.zeros((Q, G), np.float32)
    for q in range(Q):
        for g in range(G):
            acc = 0.0
            for c in range(4):
                p = pred_t[q * 4 + c][None]
                t = tgt_t[g * 4 + c]
                dl = t.long()
                wl, wr = (dl + 1).float() - t, t - dl.float()
                acc += (F.cross_entropy(p, dl[None]) * wl
                        + F.cross_entropy(p, dl[None] + 1) * wr).item()
            want[q, g] = acc / 4 / (G * 4)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

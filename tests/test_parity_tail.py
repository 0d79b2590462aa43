"""Torch oracles for the small parity-tail pieces: associative-embedding
loss (losses/ae_loss.py), the MMDet V1.x legacy delta coder
(legacy_delta_xywh_bbox_coder.py), NormedLinear/NormedConv2d
(models/utils/normed_predictor.py), and top-k accuracy
(losses/accuracy.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dskd_tpu.core.coders import legacy_bbox2delta, legacy_delta2bbox
from dskd_tpu.core.losses import accuracy, ae_loss


def torch_ae_per_image(tl, br, n):
    """Re-statement of ae_loss_per_image (ae_loss.py:11-72) on 1-d
    embeddings for the first n objects."""
    if n == 0:
        return 0.0, 0.0
    tl = tl[:n]
    br = br[:n]
    me = (tl + br) / 2.0
    pull = ((tl - me) ** 2 + (br - me) ** 2).sum() / n
    if n == 1:
        return float(pull), 0.0
    conf = me[None, :].expand(n, n).permute(1, 0) - me
    w = 1 - torch.eye(n)
    conf = w * (1.0 - conf.abs())
    push = F.relu(conf).sum() / (n * (n - 1))
    return float(pull), float(push)


@pytest.mark.parametrize("counts", [(3, 1), (0, 4), (2, 2), (1, 0)])
def test_ae_loss_matches_torch(counts):
    rng = np.random.RandomState(0)
    B, G = len(counts), 5
    tl = rng.randn(B, G).astype(np.float32)
    br = rng.randn(B, G).astype(np.float32)
    valid = np.zeros((B, G), bool)
    for i, c in enumerate(counts):
        valid[i, :c] = True
    pull, push = ae_loss(jnp.asarray(tl), jnp.asarray(br),
                         jnp.asarray(valid))
    want_pull = want_push = 0.0
    for i, c in enumerate(counts):
        p, q = torch_ae_per_image(torch.tensor(tl[i]), torch.tensor(br[i]), c)
        want_pull += p
        want_push += q
    np.testing.assert_allclose(float(pull), want_pull, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(push), want_push, rtol=1e-5, atol=1e-6)


def torch_legacy_delta2bbox(rois, deltas, means, stds, max_shape,
                            wh_ratio_clip=16 / 1000):
    """Re-statement of legacy_delta2bbox (legacy coder :134-215)."""
    means = deltas.new_tensor(means).repeat(1, deltas.size(1) // 4)
    stds = deltas.new_tensor(stds).repeat(1, deltas.size(1) // 4)
    d = deltas * stds + means
    dx, dy = d[:, 0::4], d[:, 1::4]
    dw, dh = d[:, 2::4], d[:, 3::4]
    mr = abs(float(np.log(wh_ratio_clip)))
    dw, dh = dw.clamp(-mr, mr), dh.clamp(-mr, mr)
    px = ((rois[:, 0] + rois[:, 2]) * 0.5).unsqueeze(1)
    py = ((rois[:, 1] + rois[:, 3]) * 0.5).unsqueeze(1)
    pw = (rois[:, 2] - rois[:, 0] + 1.0).unsqueeze(1)
    ph = (rois[:, 3] - rois[:, 1] + 1.0).unsqueeze(1)
    gw, gh = pw * dw.exp(), ph * dh.exp()
    gx, gy = px + pw * dx, py + ph * dy
    x1, y1 = gx - gw * 0.5, gy - gh * 0.5
    x2, y2 = gx + gw * 0.5, gy + gh * 0.5
    if max_shape is not None:
        x1 = x1.clamp(0, max_shape[1] - 1)
        y1 = y1.clamp(0, max_shape[0] - 1)
        x2 = x2.clamp(0, max_shape[1] - 1)
        y2 = y2.clamp(0, max_shape[0] - 1)
    return torch.stack([x1, y1, x2, y2], -1).view(deltas.size())


def test_legacy_coder_roundtrip_and_torch():
    rng = np.random.RandomState(1)
    rois = np.abs(rng.rand(6, 4).astype(np.float32)) * 50
    rois[:, 2:] += rois[:, :2] + 5
    gts = rois + rng.randn(6, 4).astype(np.float32) * 2
    means, stds = (0., 0., 0., 0.), (0.1, 0.1, 0.2, 0.2)
    enc = legacy_bbox2delta(jnp.asarray(rois), jnp.asarray(gts), means, stds)
    # decode deliberately drops the legacy +-0.5 corner correction
    # (reference :202-206), so the roundtrip is a half-pixel dilation
    dec = legacy_delta2bbox(jnp.asarray(rois), enc, means, stds)
    want = gts + np.array([-0.5, -0.5, 0.5, 0.5], np.float32)
    np.testing.assert_allclose(np.asarray(dec), want, rtol=1e-4, atol=1e-3)
    # multi-class decode vs torch
    deltas = rng.randn(6, 8).astype(np.float32)
    ours = legacy_delta2bbox(jnp.asarray(rois), jnp.asarray(deltas),
                             means, stds, max_shape=(60, 80))
    want = torch_legacy_delta2bbox(torch.tensor(rois), torch.tensor(deltas),
                                   means, stds, (60, 80))
    np.testing.assert_allclose(np.asarray(ours), want.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_normed_dense_matches_torch():
    from dskd_tpu.models.normed_predictor import NormedDense
    rng = np.random.RandomState(2)
    x = rng.randn(4, 16).astype(np.float32)
    mod = NormedDense(8)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = mod.apply(variables, jnp.asarray(x))
    w = np.asarray(variables["params"]["kernel"])      # (in, out)
    b = np.asarray(variables["params"]["bias"])
    tw = torch.tensor(w.T)                             # torch (out, in)
    tx = torch.tensor(x)
    w_ = tw / (tw.norm(dim=1, keepdim=True) + 1e-6)
    x_ = tx / (tx.norm(dim=1, keepdim=True) + 1e-6) * 20.0
    want = F.linear(x_, w_, torch.tensor(b))
    np.testing.assert_allclose(np.asarray(y), want.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_normed_conv_matches_torch():
    from dskd_tpu.models.normed_predictor import NormedConv
    rng = np.random.RandomState(3)
    x = rng.randn(2, 5, 5, 6).astype(np.float32)
    mod = NormedConv(4, kernel_size=(1, 1))
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = mod.apply(variables, jnp.asarray(x))
    w = np.asarray(variables["params"]["kernel"])      # (1, 1, in, out)
    b = np.asarray(variables["params"]["bias"])
    tw = torch.tensor(w[0, 0].T).unsqueeze(-1).unsqueeze(-1)  # (out, in, 1, 1)
    tx = torch.tensor(x.transpose(0, 3, 1, 2))
    w_ = tw / (tw.norm(dim=1, keepdim=True) + 1e-6)
    x_ = tx / (tx.norm(dim=1, keepdim=True) + 1e-6) * 20.0
    want = F.conv2d(x_, w_, torch.tensor(b))
    np.testing.assert_allclose(
        np.asarray(y), want.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-5)


def test_accuracy_topk():
    pred = jnp.asarray([[0.1, 0.9, 0.0],
                        [0.8, 0.1, 0.1],
                        [0.2, 0.3, 0.5],
                        [0.3, 0.3, 0.4]])
    target = jnp.asarray([1, 0, 0, 2])
    assert float(accuracy(pred, target, topk=1)) == pytest.approx(75.0)
    # row 2's target 0 (0.2) is outside its top-2 {2, 1}
    assert float(accuracy(pred, target, topk=2)) == pytest.approx(75.0)
    # thresh gates hits whose logit is too small
    assert float(accuracy(pred, target, topk=1, thresh=0.85)) == \
        pytest.approx(25.0)
    v = jnp.asarray([True, True, False, False])
    assert float(accuracy(pred, target, topk=1, valid=v)) == \
        pytest.approx(100.0)


def test_fast_nms_matches_torch():
    """Restatement of fast_nms (core/post_processing/bbox_nms.py:98-170)."""
    from dskd_tpu.core.postprocess import fast_nms
    rng = np.random.RandomState(7)
    N, C = 40, 3
    boxes = np.abs(rng.rand(N, 4).astype(np.float32)) * 60
    boxes[:, 2:] = boxes[:, :2] + rng.rand(N, 2).astype(np.float32) * 40 + 2
    scores = rng.rand(N, C).astype(np.float32)
    iou_thr, score_thr, top_k, max_out = 0.5, 0.05, 20, 10

    tb = torch.tensor(boxes)
    ts = torch.tensor(scores)
    sc, idx = ts.t().sort(1, descending=True)
    idx = idx[:, :top_k]
    sc = sc[:, :top_k]
    b = tb[idx.reshape(-1)].view(C, top_k, 4)
    x1 = torch.max(b[:, :, None, 0], b[:, None, :, 0])
    y1 = torch.max(b[:, :, None, 1], b[:, None, :, 1])
    x2 = torch.min(b[:, :, None, 2], b[:, None, :, 2])
    y2 = torch.min(b[:, :, None, 3], b[:, None, :, 3])
    inter = (x2 - x1).clamp(0) * (y2 - y1).clamp(0)
    area = (b[..., 2] - b[..., 0]).clamp(0) * (b[..., 3] - b[..., 1]).clamp(0)
    iou = inter / (area[:, :, None] + area[:, None, :] - inter).clamp(1e-9)
    iou = iou.triu_(diagonal=1)
    iou_max = iou.max(dim=1)[0]
    keep = (iou_max <= iou_thr) & (sc > score_thr)
    flat = torch.where(keep, sc, torch.tensor(-1.0)).reshape(-1)
    want_sc, oi = flat.sort(descending=True)
    want_sc = want_sc[:max_out]
    want_cls = (oi[:max_out] // top_k).numpy()
    want_det = idx.reshape(-1)[oi[:max_out]].numpy()

    ob, osc, ocls, _, ok = fast_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                    score_thr, iou_thr, top_k, max_out)
    np.testing.assert_allclose(np.asarray(osc), want_sc.numpy(), rtol=1e-5)
    valid = want_sc.numpy() > 0
    np.testing.assert_array_equal(np.asarray(ocls)[valid], want_cls[valid])
    np.testing.assert_allclose(np.asarray(ob)[valid],
                               boxes[want_det[valid]], rtol=1e-5)


def test_gaussian_splat_matches_gen_gaussian_target():
    """Restatement of gaussian2D + gen_gaussian_target
    (models/utils/gaussian_target.py:8-65): int-truncated radius, sigma
    (2r+1)/6, kernel windowed to the (2r+1)^2 extent, max-combined."""
    from dskd_tpu.models.cornernet import gaussian_splat_max

    H, W = 12, 16
    centers = [(3, 4), (10, 2), (3, 4)]
    radii = [2.7, 1.2, 4.0]
    want = np.zeros((H, W), np.float32)
    for (x, y), r in zip(centers, radii):
        r = max(0, int(r))
        sigma = (2 * r + 1) / 6.0
        xs = np.arange(-r, r + 1)
        k = np.exp(-(xs[None] ** 2 + xs[:, None] ** 2) / (2 * sigma ** 2))
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                yy, xx = y + dy, x + dx
                if 0 <= yy < H and 0 <= xx < W:
                    want[yy, xx] = max(want[yy, xx], k[dy + r, dx + r])

    ix = jnp.asarray([c[0] for c in centers], jnp.int32)
    iy = jnp.asarray([c[1] for c in centers], jnp.int32)
    weights = jnp.ones((3, 1), jnp.float32)
    got = gaussian_splat_max(ix, iy, weights, jnp.asarray(radii), (H, W))
    np.testing.assert_allclose(np.asarray(got)[..., 0], want,
                               rtol=1e-5, atol=1e-6)


def test_filter_scores_and_topk_mlvl_per_level():
    """Per-level nms_pre: each level contributes its own top-k, indices
    address the concatenated rows."""
    from dskd_tpu.core.postprocess import filter_scores_and_topk_mlvl
    rng = np.random.RandomState(11)
    sizes = [6, 3]
    scores = jnp.asarray(rng.rand(9, 2).astype(np.float32))
    r = filter_scores_and_topk_mlvl(scores, 0.0, 4, sizes)
    # level 0 yields 4 rows, level 1 all 3*2=6 pairs capped at... min(4, 6)=4
    assert r.scores.shape[0] == 4 + 4
    s = np.asarray(scores)
    # level-0 part: the top-4 (row, class) pairs from rows 0..5
    flat0 = s[:6].reshape(-1)
    want0 = np.sort(flat0)[::-1][:4]
    np.testing.assert_allclose(np.sort(np.asarray(r.scores[:4]))[::-1],
                               want0, rtol=1e-6)
    # all level-1 keep_idxs address rows >= 6
    assert (np.asarray(r.keep_idxs[4:]) >= 6).all()
    # labels consistent with the scores they index
    for i in range(8):
        ki = int(r.keep_idxs[i]); lb = int(r.labels[i])
        np.testing.assert_allclose(float(r.scores[i]), s[ki, lb], rtol=1e-6)

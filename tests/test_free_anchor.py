"""FreeAnchor: bag-loss structure + train step."""
import jax
import jax.numpy as jnp
import numpy as np

from dskd_tpu.models.free_anchor import (FreeAnchorLossConfig,
                                         free_anchor_loss)
from dskd_tpu.models.retinanet import RetinaNet, retina_anchors

B, HW, NC = 2, 64, 6


def test_free_anchor_torch_oracle():
    """Loss == a torch restatement of the reference
    (free_anchor_retina_head.py:99-272): coder stds (0.1, 0.1, 0.2, 0.2),
    saturated-linear A+ ramp, per-class max, mean-max positive bags with
    loss-weighted smooth-l1, focal-style negatives."""
    import torch

    from dskd_tpu.models.free_anchor import DELTA_STDS
    from dskd_tpu.models.retinanet import RetinaHeadOutputs

    rng = np.random.RandomState(1)
    sizes = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
    anchors = retina_anchors(sizes)
    N = anchors.shape[0]
    G = 3
    cls_scores = [jnp.asarray(rng.randn(B, h, w, 9 * NC)
                              .astype(np.float32)) for h, w in sizes]
    bbox_preds = [jnp.asarray(rng.randn(B, h, w, 9 * 4)
                              .astype(np.float32) * 0.3) for h, w in sizes]
    # large-ish gts so each bag has >50 positive-IoU anchors (no 0-IoU
    # top-k ties between the two implementations)
    xy = rng.rand(B, G, 2).astype(np.float32) * 24
    wh = rng.rand(B, G, 2).astype(np.float32) * 15 + 25
    gt = np.concatenate([xy, xy + wh], -1)
    labels = rng.randint(0, NC, (B, G)).astype(np.int32)
    valid = np.ones((B, G), bool)

    out = RetinaHeadOutputs(cls_scores=tuple(cls_scores),
                            bbox_preds=tuple(bbox_preds))
    got = free_anchor_loss(out, anchors, jnp.asarray(gt),
                           jnp.asarray(labels), jnp.asarray(valid),
                           FreeAnchorLossConfig(num_classes=NC))

    # ---- torch restatement ----
    an = torch.from_numpy(np.asarray(anchors))
    stds = torch.tensor(DELTA_STDS)
    cls_t = torch.cat([torch.from_numpy(np.asarray(c)).reshape(B, -1, NC)
                       for c in cls_scores], 1)
    reg_t = torch.cat([torch.from_numpy(np.asarray(r)).reshape(B, -1, 4)
                       for r in bbox_preds], 1)
    cls_prob = torch.sigmoid(cls_t)

    def iou(a, b):
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        lt = torch.max(a[:, None, :2], b[None, :, :2])
        rb = torch.min(a[:, None, 2:], b[None, :, 2:])
        whi = (rb - lt).clamp(min=0)
        inter = whi[..., 0] * whi[..., 1]
        return inter / (area_a[:, None] + area_b[None] - inter).clamp(1e-6)

    def decode(d):
        d = d * stds
        pwh = an[:, 2:] - an[:, :2]
        pxy = (an[:, :2] + an[:, 2:]) / 2
        gxy = pxy + pwh * d[:, :2]
        gwh = pwh * torch.exp(d[:, 2:].clamp(-np.log(1000 / 16),
                                             np.log(1000 / 16)))
        return torch.cat([gxy - gwh / 2, gxy + gwh / 2], -1)

    def encode(a, g):
        pwh = (a[:, 2:] - a[:, :2]).clamp(1e-6)
        pxy = (a[:, :2] + a[:, 2:]) / 2
        gwh = (g[:, 2:] - g[:, :2]).clamp(1e-6)
        gxy = (g[:, :2] + g[:, 2:]) / 2
        return torch.cat([(gxy - pxy) / pwh, torch.log(gwh / pwh)],
                         -1) / stds

    pos_total, neg_total, num_pos = 0.0, 0.0, 0
    for b in range(B):
        gb = torch.from_numpy(gt[b])
        gl = torch.from_numpy(labels[b]).long()
        pred_boxes = decode(reg_t[b])
        obi = iou(gb, pred_boxes)
        t2 = obi.max(1, keepdim=True).values.clamp(min=0.6 + 1e-12)
        obp = ((obi - 0.6) / (t2 - 0.6)).clamp(0, 1)
        box_prob = torch.zeros(N, NC, dtype=torch.float64)
        for g in range(G):
            c = int(gl[g])
            box_prob[:, c] = torch.maximum(box_prob[:, c],
                                           obp[g].double())
        quality = iou(gb, an)
        _, matched = torch.topk(quality, 50, dim=1)
        m_cls = cls_prob[b][matched].gather(
            2, gl.view(-1, 1, 1).repeat(1, 50, 1)).squeeze(2)
        m_anchors = an[matched]
        m_targets = encode(m_anchors.reshape(-1, 4),
                           gb[:, None].expand(-1, 50, -1).reshape(-1, 4)
                           ).reshape(G, 50, 4)
        diff = (reg_t[b][matched] - m_targets).abs()
        sl1 = 0.75 * torch.where(diff < 0.11, 0.5 * diff ** 2 / 0.11,
                                 diff - 0.055).sum(-1)
        m_prob = m_cls * torch.exp(-sl1)
        w = 1 / (1 - m_prob).clamp(min=1e-12)
        w = w / w.sum(1, keepdim=True)
        bag = (w * m_prob).sum(1)
        pos_total += float((0.5 * torch.nn.functional.binary_cross_entropy(
            bag, torch.ones_like(bag), reduction="none")).sum())
        nprob = (cls_prob[b] * (1 - box_prob.float())).clamp(1e-12,
                                                             1 - 1e-12)
        neg_total += float((0.5 * nprob ** 2
                            * torch.nn.functional.binary_cross_entropy(
                                nprob, torch.zeros_like(nprob),
                                reduction="none")).sum())
        num_pos += G

    np.testing.assert_allclose(float(got["positive_bag_loss"]),
                               pos_total / num_pos, rtol=2e-4)
    np.testing.assert_allclose(float(got["negative_bag_loss"]),
                               neg_total / (num_pos * 50), rtol=2e-4)


def test_free_anchor_loss_and_step():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, 3, 2).astype(np.float32) * 20
    wh = rng.rand(B, 3, 2).astype(np.float32) * 25 + 10
    gt = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    labels = jnp.asarray(rng.randint(0, NC, (B, 3)).astype(np.int32))
    valid = jnp.asarray(np.tile(np.arange(3) < 2, (B, 1)))

    model = RetinaNet(num_classes=NC, depth=18)
    v = model.init(jax.random.PRNGKey(0), images, img_hw)
    out = model.apply(v, images, img_hw)
    anchors = retina_anchors([c.shape[1:3] for c in out.head.cls_scores])
    losses = free_anchor_loss(out.head, anchors, gt, labels, valid,
                              FreeAnchorLossConfig(num_classes=NC))
    assert {"positive_bag_loss", "negative_bag_loss"} == set(losses)
    for k, x in losses.items():
        assert np.isfinite(float(x)) and float(x) > 0, (k, float(x))

    # perfectly confident bag -> positive loss collapses toward 0
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="free_anchor", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("free_anchor", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, Batch(images, img_hw, gt, labels, valid))
    assert np.isfinite(float(losses["loss"]))

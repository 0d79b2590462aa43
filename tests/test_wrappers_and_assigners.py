"""Dataset wrappers + distill/DETR assigner variants."""
import jax.numpy as jnp
import numpy as np
import pytest

from dskd_tpu.core.matching import (classification_cost,
                                    detr_match_cost,
                                    distill_hungarian_assign,
                                    focal_loss_cost)


class FakeDataset:
    def __init__(self, labels_per_img):
        self.labels = labels_per_img

    def __len__(self):
        return len(self.labels)

    def get_raw(self, idx):
        labels = np.array(self.labels[idx], np.int32)
        boxes = np.zeros((len(labels), 4), np.float32)
        return f"img{idx}", (10, 10), boxes, labels, idx + 1


def test_repeat_and_concat():
    from dskd_tpu.data.wrappers import ConcatDataset, RepeatDataset
    ds = FakeDataset([[0], [1], [2]])
    r = RepeatDataset(ds, 3)
    assert len(r) == 9
    assert r.get_raw(4)[4] == 2  # idx 4 -> base idx 1 -> img_id 2
    c = ConcatDataset([ds, ds])
    assert len(c) == 6
    assert c.get_raw(5)[4] == 3


def test_class_balanced_oversamples_rare():
    from dskd_tpu.data.wrappers import ClassBalancedDataset
    # class 1 appears once in 10 images -> oversampled
    ds = FakeDataset([[0]] * 9 + [[1]])
    cb = ClassBalancedDataset(ds, oversample_thr=0.5)
    counts = {}
    for i in range(len(cb)):
        img_id = cb.get_raw(i)[4]
        counts[img_id] = counts.get(img_id, 0) + 1
    assert counts[10] > counts[1]


def test_focal_and_classification_costs():
    rng = np.random.RandomState(0)
    logits = jnp.array(rng.randn(6, 4).astype(np.float32))
    labels = jnp.array([0, 3], jnp.int32)
    f = np.asarray(focal_loss_cost(logits, labels))
    c = np.asarray(classification_cost(logits, labels))
    assert f.shape == (6, 2) and c.shape == (6, 2)
    assert (c <= 0).all()  # negative probabilities


def test_distill_hungarian_assign():
    rng = np.random.RandomState(1)
    Q, K = 12, 4
    logits = jnp.array(rng.randn(Q, 6).astype(np.float32))
    bbox = jnp.array(rng.rand(Q, 4).astype(np.float32) * 0.5 + 0.25)
    t_boxes = jnp.array(np.sort(rng.rand(K, 4) * 200, -1)[:, [0, 2, 1, 3]]
                        .astype(np.float32))
    t_labels = jnp.array(rng.randint(0, 6, K), jnp.int32)
    t_valid = jnp.array([True, True, True, False])
    hw = jnp.array([320, 320], jnp.int32)
    res = distill_hungarian_assign(logits, bbox, t_boxes, t_labels, t_valid,
                                   hw)
    assert int(res.num_pos) == 3
    matched = np.asarray(res.assigned_gt)
    assert sorted(matched[matched >= 0].tolist()) == [0, 1, 2]

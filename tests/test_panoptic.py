"""Panoptic FPN: semantic head geometry, things-to-void remap, heuristic
fusion, PQ protocol oracles, panoptic dataset codecs, family train step,
end-to-end PQ evaluation smoke; DropBlock plugin."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dskd_tpu.models.panoptic_fpn import (INSTANCE_OFFSET, PanopticFPN,
                                          PanopticFPNHead, heuristic_fuse,
                                          semantic_loss,
                                          set_things_to_void)

NT, NS = 4, 3              # things, stuff (tiny fixtures)


def test_panoptic_head_shapes():
    head = PanopticFPNHead(num_stuff_classes=NS, inner_channels=32)
    feats = [jnp.zeros((1, 16 // 2 ** i, 16 // 2 ** i, 32))
             for i in range(5)]
    v = head.init(jax.random.PRNGKey(0), feats)
    out = head.apply(v, feats)
    assert out.shape == (1, 16, 16, NS + 1)   # all towers land at 1/4


def test_set_things_to_void_and_loss():
    g = jnp.asarray([[0, NT - 1, NT, NT + NS - 1, 255]])
    r = np.asarray(set_things_to_void(g, NT, NS))
    # things -> merged channel NS; stuff -> 0..NS-1; void untouched
    np.testing.assert_array_equal(r, [[NS, NS, 0, NS - 1, 255]])

    # a logit map exactly matching the remapped GT has near-zero loss;
    # void pixels don't contribute
    H = W = 4
    gt = np.full((1, H, W), 255, np.int32)
    gt[0, 0, 0] = NT           # stuff 0
    gt[0, 1, 1] = 0            # thing -> channel NS
    logits = np.zeros((1, H, W, NS + 1), np.float32)
    logits[0, 0, 0, 0] = 20.0
    logits[0, 1, 1, NS] = 20.0
    loss = float(semantic_loss(jnp.asarray(logits), jnp.asarray(gt),
                               NT, NS))
    assert loss < 1e-3
    # flip one target -> loss grows
    logits[0, 0, 0, 0] = -20.0
    assert float(semantic_loss(jnp.asarray(logits), jnp.asarray(gt),
                               NT, NS)) > 1.0


def test_heuristic_fuse():
    H = W = 40
    # two instances, the lower-scored one mostly covered by the first
    m1 = np.zeros((H, W), bool); m1[5:25, 5:25] = True
    m2 = np.zeros((H, W), bool); m2[6:24, 6:24] = True     # 90% overlap
    m3 = np.zeros((H, W), bool); m3[30:38, 30:38] = True
    masks = np.stack([m1, m2, m3])
    boxes = np.array([[5, 5, 25, 25], [6, 6, 24, 24], [30, 30, 38, 38]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    labels = np.array([0, 1, 2], np.int64)
    seg = np.zeros((H, W, NS + 1), np.float32)
    seg[..., 1] = 1.0         # stuff class 1 everywhere
    pan = heuristic_fuse(boxes, scores, labels, masks, seg, NT, NS,
                         stuff_area_limit=10)
    # instance 1 keeps its pixels; overlapped instance 2 is dropped
    assert pan[10, 10] == 0 + 1 * INSTANCE_OFFSET
    assert not np.any(pan % INSTANCE_OFFSET == 1)
    # instance 3 becomes the second laid instance
    assert pan[33, 33] == 2 + 2 * INSTANCE_OFFSET
    # background is stuff channel 1 -> contiguous label NT + 1
    assert pan[0, 0] == NT + 1
    # tiny-stuff filter: with a huge area limit everything stuffs to void
    pan2 = heuristic_fuse(boxes, scores, labels, masks, seg, NT, NS,
                          stuff_area_limit=10 ** 6)
    assert pan2[0, 0] == NT + NS


def test_pq_stat_oracles():
    from dskd_tpu.eval.panoptic_eval import PQStat
    void = NT + NS
    H = W = 32
    gt = np.full((H, W), NT, np.int64)          # stuff class NT everywhere
    gt[4:16, 4:16] = 1 + 1 * INSTANCE_OFFSET    # one thing instance

    # perfect prediction -> PQ 100 everywhere
    st = PQStat()
    st.add_image(gt, gt.copy(), void_label=void)
    res = st.summarize([0, 1, 2, 3], [NT, NT + 1, NT + 2])
    assert res["PQ"] == pytest.approx(100.0)
    assert res["PQ_th"] == pytest.approx(100.0)
    assert res["SQ"] == pytest.approx(100.0)

    # missing the thing instance: stuff TP (iou<1), thing FN
    pred = np.full((H, W), NT, np.int64)
    st2 = PQStat()
    st2.add_image(gt, pred, void_label=void)
    res2 = st2.summarize([0, 1, 2, 3], [NT])
    assert res2["PQ_th"] == pytest.approx(0.0)      # 0 / (0 + 0.5*1)
    iou = (H * W - 144) / (H * W)                   # stuff overfills
    assert res2["PQ_st"] == pytest.approx(100 * iou, abs=0.1)

    # crowd GT: unmatched crowd neither FN nor blames overlapping preds
    st3 = PQStat()
    gt3 = gt.copy()
    crowd = {1 + 1 * INSTANCE_OFFSET: 1}
    st3.add_image(gt3, pred, void_label=void, gt_crowd=crowd)
    res3 = st3.summarize([1], [NT])
    assert res3["PQ_th"] == -1.0                    # no counted segments


def test_rgb2id_roundtrip_and_dataset(tmp_path):
    from dskd_tpu.data.coco_panoptic import (CocoPanopticDataset, id2rgb,
                                             rgb2id)
    ids = np.array([[0, 1, 256], [65536, 300000, 12345]], np.int64)
    assert (rgb2id(id2rgb(ids)) == ids).all()

    cv2 = pytest.importorskip("cv2")
    H = W = 32
    seg = np.zeros((H, W), np.int64)
    seg[4:16, 4:16] = 7        # thing segment id 7
    seg[20:30, 2:30] = 9       # stuff segment id 9
    png = id2rgb(seg)
    os.makedirs(tmp_path / "pan", exist_ok=True)
    cv2.imwrite(str(tmp_path / "pan" / "0.png"), png[:, :, ::-1])

    data = {
        "images": [{"id": 1, "file_name": "0.jpg", "width": W,
                    "height": H}],
        "annotations": [{
            "image_id": 1, "file_name": "0.png",
            "segments_info": [
                {"id": 7, "category_id": 100, "iscrowd": 0,
                 "bbox": [4, 4, 12, 12], "area": 144},
                {"id": 9, "category_id": 200, "iscrowd": 0,
                 "bbox": [2, 20, 28, 10], "area": 280}]}],
        "categories": [
            {"id": 100, "name": "cat", "isthing": 1},
            {"id": 200, "name": "sky", "isthing": 0}],
    }
    ann = tmp_path / "pan.json"
    ann.write_text(json.dumps(data))
    ds = CocoPanopticDataset(str(ann), seg_prefix=str(tmp_path / "pan"))
    assert len(ds) == 1 and ds.num_things == 1 and ds.num_stuff == 1
    path, hw, boxes, labels, img_id = ds.get_raw(0)
    np.testing.assert_allclose(boxes, [[4, 4, 16, 16]])
    assert labels.tolist() == [0]

    sem = ds.get_semantic(0)
    assert sem[10, 10] == 0            # thing label 0
    assert sem[25, 25] == 1            # stuff label 1 (after things)
    assert sem[0, 0] == 255            # unlabeled -> void

    segm = ds.get_segmentations(0)
    assert len(segm) == 1
    from dskd_tpu.data.masks import ann_to_bitmap
    bm = ann_to_bitmap(segm[0], H, W)
    assert bm[10, 10] and not bm[0, 0] and bm.sum() == 144

    pan, crowd = ds.get_pan_gt(1)
    assert pan[10, 10] == 0 + 1 * INSTANCE_OFFSET
    assert pan[25, 25] == 1
    assert pan[0, 0] == ds.num_things + ds.num_stuff
    assert crowd == {}


def test_panoptic_family_step():
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    B, HW = 1, 64
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, 3, 2).astype(np.float32) * 20
    wh = rng.rand(B, 3, 2).astype(np.float32) * 25 + 10
    gtb = np.concatenate([xy, xy + wh], -1)
    yy, xx = np.mgrid[0:HW // 4, 0:HW // 4]
    gm = ((yy[None, None] * 4 >= gtb[:, :, 1, None, None])
          & (yy[None, None] * 4 <= gtb[:, :, 3, None, None])
          & (xx[None, None] * 4 >= gtb[:, :, 0, None, None])
          & (xx[None, None] * 4 <= gtb[:, :, 2, None, None]))
    sem = rng.randint(0, NT + NS, (B, HW // 4, HW // 4)).astype(np.int32)

    model = PanopticFPN(num_classes=NT, num_stuff_classes=NS, depth=18)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="panoptic_fpn", num_classes=NT,
                          num_stuff_classes=NS),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    cfg.rcnn_num_proposals = 16
    cfg.rcnn_num_samples = 16
    v = model.init(jax.random.PRNGKey(0), images, img_hw,
                   method=PanopticFPN.init_all)
    assert "semantic_head" in v["params"]
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("panoptic_fpn", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, Batch(
        images, img_hw, jnp.asarray(gtb),
        jnp.asarray(rng.randint(0, NT, (B, 3)).astype(np.int32)),
        jnp.asarray(np.tile(np.arange(3) < 2, (B, 1))),
        gt_masks=jnp.asarray(gm.astype(np.float32)),
        gt_semantic=jnp.asarray(sem)))
    assert "loss_seg" in losses and "loss_mask" in losses
    assert np.isfinite(float(losses["loss"]))


def test_evaluate_panoptic_smoke(tmp_path, monkeypatch):
    """Random-weight PanopticFPN through the full PQ pipeline: jitted
    inference, host fusion, PQ against panoptic PNG GT."""
    cv2 = pytest.importorskip("cv2")
    import dskd_tpu.data.loader as loader_mod
    from dskd_tpu.data.coco_panoptic import CocoPanopticDataset, id2rgb
    from dskd_tpu.data.loader import DataLoader
    from dskd_tpu.data.pipeline import PipelineConfig
    from dskd_tpu.eval.panoptic_eval import evaluate_panoptic

    H = W = 64
    os.makedirs(tmp_path / "pan", exist_ok=True)
    images, anns = [], []
    for i in range(2):
        seg = np.zeros((H, W), np.int64)
        seg[8:32, 8:32] = 7
        seg[40:60, 4:60] = 9
        cv2.imwrite(str(tmp_path / "pan" / f"{i}.png"),
                    id2rgb(seg)[:, :, ::-1])
        images.append({"id": i + 1, "file_name": f"{i}.jpg", "width": W,
                       "height": H})
        anns.append({
            "image_id": i + 1, "file_name": f"{i}.png",
            "segments_info": [
                {"id": 7, "category_id": 100, "iscrowd": 0,
                 "bbox": [8, 8, 24, 24], "area": 576},
                {"id": 9, "category_id": 200, "iscrowd": 0,
                 "bbox": [4, 40, 56, 20], "area": 1120}]})
    data = {"images": images, "annotations": anns,
            "categories": [{"id": 100, "name": "cat", "isthing": 1},
                           {"id": 200, "name": "sky", "isthing": 0}]}
    ann = tmp_path / "pan.json"
    ann.write_text(json.dumps(data))
    ds = CocoPanopticDataset(str(ann), seg_prefix=str(tmp_path / "pan"),
                             test_mode=True)
    monkeypatch.setattr(loader_mod, "load_image",
                        lambda p: np.zeros((H, W, 3), np.uint8))
    dl = DataLoader(ds, batch_size=2, train=False,
                    pipeline=PipelineConfig(max_gt=4, bucket=(64, 64),
                                            img_scale=(64, 64)))
    model = PanopticFPN(num_classes=1, num_stuff_classes=1, depth=18)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
                   jnp.asarray([[H, W]], np.int32),
                   method=PanopticFPN.init_all)
    res = evaluate_panoptic(model, v, ds, dl, max_per_img=8)
    assert set(res) >= {"PQ", "SQ", "RQ", "PQ_th", "PQ_st"}
    for k, val in res.items():
        assert val == -1.0 or 0.0 <= val <= 100.0, (k, val)


def test_dropblock():
    from dskd_tpu.models.plugins import DropBlock
    x = jnp.ones((2, 24, 24, 8))
    db = DropBlock(drop_prob=0.2, block_size=3)
    v = db.init({"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, x,
                deterministic=True)
    # deterministic: identity
    np.testing.assert_array_equal(np.asarray(db.apply(v, x)), np.asarray(x))
    y = np.asarray(db.apply(v, x, deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(2)}))
    dropped = (y == 0).mean()
    assert 0.05 < dropped < 0.5            # ~drop_prob, block-inflated
    # kept activations are renormalized upward
    assert y.max() > 1.0
    # zeros come in contiguous blocks: a dropped pixel has a dropped
    # 4-neighbor far more often than independent dropout would produce
    z = (y[0, :, :, 0] == 0)
    if z.sum() > 4:
        nb = (z[1:, :] & z[:-1, :]).sum() + (z[:, 1:] & z[:, :-1]).sum()
        assert nb > 0

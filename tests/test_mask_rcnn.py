"""Mask R-CNN: mask head shapes, target crop geometry, paste round-trip,
family train step; data/masks.py polygon + RLE codecs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dskd_tpu.models.mask_rcnn import (FCNMaskHead, MaskRCNN, mask_loss,
                                       mask_targets, paste_masks)

B, HW, NC = 1, 64, 6


def test_fcn_mask_head_shapes():
    m = FCNMaskHead(num_classes=NC, num_convs=2, channels=16)
    x = jnp.zeros((3, 14, 14, 32))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (3, 28, 28, NC)


def test_mask_targets_and_paste_roundtrip():
    """A GT bitmap that's a filled box, cropped to its own ROI, must be
    (nearly) all-ones; pasting the all-ones 28-grid back into the box
    reproduces the box region."""
    box = jnp.asarray(np.array([[8.0, 12.0, 40.0, 52.0]]))
    yy, xx = np.mgrid[0:32, 0:32]                      # stride-4 bitmap
    bm = ((yy * 4 >= 12) & (yy * 4 <= 52) & (xx * 4 >= 8)
          & (xx * 4 <= 40)).astype(np.float32)
    tgt = mask_targets(box, jnp.asarray(bm[None]), mask_stride=4)
    assert tgt.shape == (1, 28, 28)
    assert float(tgt.mean()) > 0.85                    # interior filled
    # paste: all-ones grid -> exactly the (clipped) box support
    pasted = paste_masks(jnp.ones((1, 28, 28)), box, (64, 64))
    p = np.asarray(pasted)[0]
    assert p[30, 20] and p[14, 10]
    assert not p[5, 20] and not p[30, 50]
    area = p.sum()
    exp = (52 - 12) * (40 - 8)
    assert abs(area - exp) / exp < 0.15


def test_mask_loss_prefers_correct_mask():
    rng = np.random.RandomState(0)
    tgt = jnp.asarray((rng.rand(4, 28, 28) > 0.5).astype(np.float32))
    labels = jnp.asarray(np.array([0, 1, 2, 3], np.int32))
    valid = jnp.ones((4,), bool)
    good = jnp.zeros((4, 28, 28, NC))
    good = good.at[..., :].set(-8.0)
    for i in range(4):
        good = good.at[i, :, :, i].set((np.asarray(tgt[i]) * 16 - 8))
    bad = -good
    lg = float(mask_loss(good, tgt, labels, valid))
    lb = float(mask_loss(bad, tgt, labels, valid))
    assert lg < lb


def test_mask_rcnn_family_step():
    from dskd_tpu.train.family import make_family_train_step
    from dskd_tpu.train.optim import make_optimizer
    from dskd_tpu.train.state import TrainState
    from dskd_tpu.train.step import Batch
    from dskd_tpu.utils.config import (DistillFlags, ExperimentConfig,
                                       ModelConfig)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, HW, HW, 3).astype(np.float32) * 0.2)
    img_hw = jnp.asarray(np.tile([[HW, HW]], (B, 1)).astype(np.int32))
    xy = rng.rand(B, 3, 2).astype(np.float32) * 20
    wh = rng.rand(B, 3, 2).astype(np.float32) * 25 + 10
    gtb = np.concatenate([xy, xy + wh], -1)
    labels = jnp.asarray(rng.randint(0, NC, (B, 3)).astype(np.int32))
    valid = jnp.asarray(np.tile(np.arange(3) < 2, (B, 1)))
    yy, xx = np.mgrid[0:HW // 4, 0:HW // 4]
    gm = ((yy[None, None] * 4 >= gtb[:, :, 1, None, None])
          & (yy[None, None] * 4 <= gtb[:, :, 3, None, None])
          & (xx[None, None] * 4 >= gtb[:, :, 0, None, None])
          & (xx[None, None] * 4 <= gtb[:, :, 2, None, None]))

    model = MaskRCNN(num_classes=NC, depth=18)
    cfg = ExperimentConfig(
        model=ModelConfig(arch="mask_rcnn", num_classes=NC),
        distill=DistillFlags(cates_distill="", feats_distill=""))
    cfg.rcnn_num_proposals = 16
    cfg.rcnn_num_samples = 16
    v = model.init(jax.random.PRNGKey(0), images, img_hw,
                   method=MaskRCNN.init_all)
    assert "mask_head" in v["params"]
    tx = make_optimizer(v["params"], lambda i: 1e-4)
    state = TrainState.create(v["params"], v.get("batch_stats", {}), tx,
                              jax.random.PRNGKey(1))
    step = make_family_train_step("mask_rcnn", model, cfg, num_prev=0,
                                  has_teacher=False, use_dropout=False)
    _, losses = step(state, Batch(images, img_hw, jnp.asarray(gtb),
                                  labels, valid,
                                  gt_masks=jnp.asarray(
                                      gm.astype(np.float32))))
    assert "loss_mask" in losses and "rcnn_loss_cls" in losses
    assert np.isfinite(float(losses["loss"]))


def test_polygon_and_rle_codecs():
    from dskd_tpu.data.masks import (ann_to_bitmap, polygon_to_bitmap,
                                     rle_decode_uncompressed,
                                     rle_string_to_counts)

    # axis-aligned square polygon == box fill
    bm = polygon_to_bitmap([[2, 3, 8, 3, 8, 9, 2, 9]], 12, 12)
    assert bm.shape == (12, 12)
    assert bm[5, 5] and bm[3, 2] and not bm[1, 1] and not bm[10, 10]
    assert bm.sum() == 36                              # 6x6 at centers
    # triangle: half the square's area, vertices covered correctly
    tri = polygon_to_bitmap([[0, 0, 10, 0, 0, 10]], 10, 10)
    assert tri[0, 0] and not tri[9, 9]
    assert 40 <= tri.sum() <= 55
    # two disjoint parts accumulate
    two = polygon_to_bitmap([[0, 0, 4, 0, 4, 4, 0, 4],
                             [6, 6, 9, 6, 9, 9, 6, 9]], 10, 10)
    assert two[2, 2] and two[7, 7] and not two[5, 5]

    # uncompressed RLE is column-major
    # flat F-order [0,1,1, 0,0,0]; (r, c) = flat[c*h + r]
    m = rle_decode_uncompressed([1, 2, 3], 3, 2)       # 3x2, F-order
    np.testing.assert_array_equal(
        m, np.array([[0, 0], [1, 0], [1, 0]], bool))

    # compressed string round-trip against a known pycocotools example:
    # leading 6-bit LEB chunks, delta-coded from the 3rd count on
    counts = rle_string_to_counts(rle_string_to_counts_ref_encode(
        [6, 1, 40, 4, 5]))
    assert counts == [6, 1, 40, 4, 5]
    rle = {"counts": rle_string_to_counts_ref_encode([6, 1, 40, 4, 5]),
           "size": [8, 7]}
    dec = ann_to_bitmap(rle, 8, 7)
    ref = rle_decode_uncompressed([6, 1, 40, 4, 5], 8, 7)
    np.testing.assert_array_equal(dec, ref)


def rle_string_to_counts_ref_encode(cnts):
    """Inverse of rle_string_to_counts (pycocotools rleToString), used to
    build compressed fixtures without pycocotools."""
    out = []
    for i, x in enumerate(cnts):
        if i > 2:
            x = x - cnts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def test_loader_yields_gt_masks(tmp_path, monkeypatch):
    """with_mask pipelines rasterize COCO polygons into Batch.gt_masks
    aligned with the GT box slots (LoadAnnotations with_mask=True)."""
    import json
    import os

    import dskd_tpu.data.loader as loader_mod
    from dskd_tpu.data.coco import (COCO_CLASSES_ALPHA_ORDER,
                                    TaskCocoDataset)
    from dskd_tpu.data.loader import DataLoader
    from dskd_tpu.data.pipeline import PipelineConfig

    cats = [{"id": cid, "name": n} for n, cid in COCO_CLASSES_ALPHA_ORDER]
    images = [{"id": 1, "file_name": "a.jpg", "width": 100, "height": 80},
              {"id": 2, "file_name": "b.jpg", "width": 100, "height": 80}]
    anns = [{"id": i + 1, "image_id": i + 1, "category_id": 5,
             "bbox": [10, 10, 30, 20], "area": 600, "iscrowd": 0,
             "segmentation": [[10, 10, 40, 10, 40, 30, 10, 30]]}
            for i in range(2)]
    ann = os.path.join(str(tmp_path), "ann.json")
    with open(ann, "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": cats}, f)
    ds = TaskCocoDataset(ann, catsplit=(4,), catload=(1,), test_mode=True)
    monkeypatch.setattr(loader_mod, "load_image",
                        lambda p: np.zeros((80, 100, 3), np.uint8))
    dl = DataLoader(ds, batch_size=2, train=False,
                    pipeline=PipelineConfig(max_gt=4, bucket=(40, 40),
                                            img_scale=(40, 40),
                                            with_mask=True, mask_stride=4))
    batch, _ = next(iter(dl))
    assert batch.gt_masks is not None
    assert batch.gt_masks.shape == (2, 4, 10, 10)
    m = np.asarray(batch.gt_masks[0, 0])
    # scale 0.4: cell centers map to orig (i*4+2)/0.4 = 10i+5; the
    # [10,40]x[10,30] polygon covers x cells 1..3, y cells 1..2
    assert m[1:3, 1:4].all()
    ref = np.zeros((10, 10))
    ref[1:3, 1:4] = 1
    np.testing.assert_array_equal(m, ref)
    assert np.asarray(batch.gt_masks[0, 1]).sum() == 0  # padding slot


def test_segm_eval_protocol():
    """iou_type='segm' matches by mask IoU: perfect masks -> mAP 1; the
    same boxes with disjoint masks -> 0 (the box IoU is 1 either way)."""
    from dskd_tpu.eval.coco_eval import CocoDetectionEval, mask_iou

    gtb = np.array([[10.0, 10.0, 40.0, 40.0]])
    gm = np.zeros((1, 60, 60), bool)
    gm[0, 10:40, 10:40] = True

    ev = CocoDetectionEval(cat_ids=[1], iou_type="segm")
    ev.add_gt(1, gtb, [1], masks=gm)
    ev.add_dt(1, gtb, [0.9], [1], masks=gm.copy())
    assert ev.summarize()["segm_mAP"] == 1.0

    bad = np.zeros((1, 60, 60), bool)
    bad[0, 41:59, 41:59] = True                       # disjoint support
    ev2 = CocoDetectionEval(cat_ids=[1], iou_type="segm")
    ev2.add_gt(1, gtb, [1], masks=gm)
    ev2.add_dt(1, gtb, [0.9], [1], masks=bad)
    assert ev2.summarize()["segm_mAP"] == 0.0

    # mask_iou oracle: half-overlap squares
    a = np.zeros((1, 100), bool); a[0, :40] = True
    b = np.zeros((1, 100), bool); b[0, 20:60] = True
    iou = mask_iou(a.reshape(1, -1), b.reshape(1, -1), np.zeros(1))
    assert iou[0, 0] == pytest.approx(20 / 60)
    # crowd GT uses IoF (union = dt area)
    iou_c = mask_iou(a.reshape(1, -1), b.reshape(1, -1), np.ones(1))
    assert iou_c[0, 0] == pytest.approx(20 / 40)


def test_paste_masks_np_matches_device_paste():
    from dskd_tpu.data.masks import paste_masks_np
    rng = np.random.RandomState(0)
    probs = rng.rand(2, 28, 28).astype(np.float32)
    boxes = np.array([[5.0, 7.0, 45.0, 39.0], [0.0, 0.0, 20.0, 60.0]])
    host = paste_masks_np(probs, boxes, (64, 64))
    dev = np.asarray(paste_masks(jnp.asarray(probs), jnp.asarray(boxes),
                                 (64, 64)))
    assert (host == dev).mean() > 0.995  # fp-order boundary ties only


def test_mask_rcnn_evaluate_segm_stats(tmp_path, monkeypatch):
    """evaluate(arch='mask_rcnn') produces finite bbox AND segm stats from
    a polygon-annotated fixture (random weights; protocol smoke)."""
    import json
    import os

    import dskd_tpu.data.loader as loader_mod
    from dskd_tpu.data.coco import (COCO_CLASSES_ALPHA_ORDER,
                                    TaskCocoDataset)
    from dskd_tpu.data.loader import DataLoader
    from dskd_tpu.data.pipeline import PipelineConfig
    from dskd_tpu.eval.evaluator import evaluate

    cats = [{"id": cid, "name": n} for n, cid in COCO_CLASSES_ALPHA_ORDER]
    images = [{"id": i + 1, "file_name": f"{i}.jpg", "width": 64,
               "height": 64} for i in range(2)]
    anns = [{"id": i + 1, "image_id": i + 1, "category_id": 5,
             "bbox": [8, 8, 24, 24], "area": 576, "iscrowd": 0,
             "segmentation": [[8, 8, 32, 8, 32, 32, 8, 32]]}
            for i in range(2)]
    ann = os.path.join(str(tmp_path), "ann.json")
    with open(ann, "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": cats}, f)
    ds = TaskCocoDataset(ann, catsplit=(4,), catload=(1,), test_mode=True)
    monkeypatch.setattr(loader_mod, "load_image",
                        lambda p: np.zeros((64, 64, 3), np.uint8))
    dl = DataLoader(ds, batch_size=2, train=False,
                    pipeline=PipelineConfig(max_gt=4, bucket=(64, 64),
                                            img_scale=(64, 64)))
    model = MaskRCNN(num_classes=4, depth=18)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 64, 3)),
                   jnp.asarray([[64, 64]], np.int32),
                   method=MaskRCNN.init_all)
    stats = evaluate(model, v, ds, dl, arch="mask_rcnn", max_per_img=10)
    assert "bbox_mAP" in stats and "segm_mAP" in stats
    assert np.isfinite(stats["segm_mAP"])
    assert "segm_mAP_50" in stats and "segm_mAP_l" in stats


def test_batch_gt_masks_layout():
    from dskd_tpu.data.masks import batch_gt_masks
    segs = [[[0, 0, 16, 0, 16, 16, 0, 16]]]            # 16x16 box poly
    out = batch_gt_masks(segs, orig_hw=(32, 32), scale=2.0,
                         canvas_hw=(80, 80), max_gt=3, mask_stride=4)
    assert out.shape == (3, 20, 20)
    # scaled 2x: the box covers input coords [0,32) -> stride-4 cells 0..7
    assert out[0, 3, 3] == 1.0 and out[0, 9, 9] == 0.0
    assert out[1].sum() == 0                           # padding slot
    # canvas area beyond the scaled image stays empty
    assert out[0, :, 17:].sum() == 0

"""Unit oracles for the analysis tools (kmeans anchors, per-image score)."""
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools",
                                "analysis_tools"))

from analyze_results import per_image_score  # noqa: E402
from optimize_anchors import kmeans_anchors, wh_iou  # noqa: E402


def test_wh_iou_identity():
    wh = np.array([[10.0, 20.0], [5.0, 5.0]])
    iou = wh_iou(wh, wh)
    np.testing.assert_allclose(np.diag(iou), 1.0)
    # 5x5 inside 10x20: inter 25, union 200
    np.testing.assert_allclose(iou[0, 1], 25.0 / 200.0)


def test_kmeans_recovers_clusters():
    rng = np.random.RandomState(0)
    a = np.abs(rng.randn(200, 2) * 2) + [10, 10]
    b = np.abs(rng.randn(200, 2) * 5) + [100, 50]
    c = np.abs(rng.randn(200, 2) * 8) + [300, 300]
    whs = np.concatenate([a, b, c])
    anchors, mean_iou = kmeans_anchors(whs, 3, iters=50)
    # sorted by area: near (10,10), (100,50), (300,300)
    assert mean_iou > 0.8
    np.testing.assert_allclose(anchors[0], [10, 10], rtol=0.3)
    np.testing.assert_allclose(anchors[2], [300, 300], rtol=0.2)


def test_per_image_score_values():
    gts = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    # perfect: both matched, no extras -> 1.0
    dets = np.array([[0, 0, 10, 10, 0.9], [20, 20, 30, 30, 0.8]],
                    np.float32)
    assert per_image_score(dets, gts) == 1.0
    # one TP of two dets, one GT of two covered -> P=0.5, R=0.5 -> F1=0.5
    dets = np.array([[0, 0, 10, 10, 0.9], [50, 50, 60, 60, 0.8]],
                    np.float32)
    np.testing.assert_allclose(per_image_score(dets, gts), 0.5)
    # empty dets with GT -> 0; empty both -> 1
    assert per_image_score(np.zeros((0, 5)), gts) == 0.0
    assert per_image_score(np.zeros((0, 5)), np.zeros((0, 4))) == 1.0


def test_voc_to_coco_roundtrip(tmp_path):
    """VOC xml -> COCO json conversion (1-indexed inclusive -> xywh)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools", "dataset_converters"))
    from pascal_voc import voc_split_to_coco

    vocdir = tmp_path / "VOC2007"
    (vocdir / "Annotations").mkdir(parents=True)
    (vocdir / "ImageSets" / "Main").mkdir(parents=True)
    (vocdir / "ImageSets" / "Main" / "trainval.txt").write_text("000001\n")
    (vocdir / "Annotations" / "000001.xml").write_text("""
<annotation><size><width>100</width><height>80</height><depth>3</depth>
</size><object><name>dog</name><difficult>0</difficult>
<bndbox><xmin>11</xmin><ymin>21</ymin><xmax>50</xmax><ymax>60</ymax>
</bndbox></object></annotation>""")

    out = tmp_path / "out.json"
    import json
    n_img, n_ann = voc_split_to_coco(str(tmp_path), "2007", "trainval",
                                     str(out))
    assert (n_img, n_ann) == (1, 1)
    data = json.load(open(out))
    ann = data["annotations"][0]
    # xmin-1=10, ymin-1=20, w=50-10=40, h=60-20=40
    assert ann["bbox"] == [10.0, 20.0, 40.0, 40.0]
    dog_id = [c["id"] for c in data["categories"] if c["name"] == "dog"][0]
    assert ann["category_id"] == dog_id


def test_images2coco(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools", "dataset_converters"))
    import cv2
    from images2coco import images2coco

    d = tmp_path / "imgs"
    d.mkdir()
    cv2.imwrite(str(d / "a.jpg"), np.zeros((10, 20, 3), np.uint8))
    cv2.imwrite(str(d / "b.png"), np.zeros((30, 40, 3), np.uint8))
    (d / "notes.txt").write_text("skip me")
    out = tmp_path / "ann.json"
    n = images2coco(str(d), ["cat", "dog"], str(out))
    assert n == 2
    import json
    data = json.load(open(out))
    assert data["images"][0]["height"] == 10
    assert data["images"][1]["width"] == 40
    assert len(data["categories"]) == 2


def test_cityscapes_converter(tmp_path):
    """Synthetic gtFine instanceIds map -> COCO json: id semantics
    (label*1000+i vs crowd <1000, ignoreInEval dropped), boxes, areas."""
    import cv2
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "cs_conv", os.path.join(os.path.dirname(__file__), "..", "tools",
                                "dataset_converters", "cityscapes.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    img_dir = tmp_path / "leftImg8bit" / "val" / "city"
    gt_dir = tmp_path / "gtFine" / "val" / "city"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    inst = np.zeros((40, 60), np.uint16)
    inst[5:15, 5:25] = 26000          # car instance 0
    inst[20:30, 30:50] = 24001        # person instance 1
    inst[32:38, 2:12] = 26            # car crowd region (< 1000)
    inst[2:4, 50:58] = 29000          # caravan: ignoreInEval, dropped
    cv2.imwrite(str(img_dir / "a_leftImg8bit.png"),
                np.zeros((40, 60, 3), np.uint8))
    cv2.imwrite(str(gt_dir / "a_gtFine_instanceIds.png"), inst)

    out = mod.convert_split(str(tmp_path), "val")
    assert len(out["images"]) == 1
    anns = out["annotations"]
    assert len(anns) == 3
    by_cat = {}
    for a in anns:
        by_cat.setdefault(a["category_id"], []).append(a)
    car_instances = [a for a in by_cat[26] if not a["iscrowd"]]
    assert len(car_instances) == 1
    assert car_instances[0]["bbox"] == [5, 5, 20, 10]
    assert car_instances[0]["area"] == 200
    assert car_instances[0]["segmentation"]
    crowd = [a for a in by_cat[26] if a["iscrowd"]]
    assert len(crowd) == 1
    assert by_cat[24][0]["bbox"] == [30, 20, 20, 10]
    assert 29 not in by_cat and not any(
        a["category_id"] == 29 for a in anns)
    # the converted json loads straight into the dataset binding
    import json as _json
    p = tmp_path / "cs.json"
    p.write_text(_json.dumps(out))
    from dskd_tpu.data.cityscapes import CityscapesDataset
    ds = CityscapesDataset(str(p), str(img_dir))
    assert len(ds) == 1
    _, _, boxes, labels, _ = ds.get_raw(0)
    assert len(boxes) >= 2


def test_publish_model_strips_and_hashes(tmp_path):
    import importlib.util
    import os

    import orbax.checkpoint as ocp

    spec = importlib.util.spec_from_file_location(
        "pub", os.path.join(os.path.dirname(__file__), "..", "tools",
                            "model_converters", "publish_model.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    payload = {"params": {"w": np.ones((3,), np.float32)},
               "batch_stats": {},
               "opt_state": {"m": np.zeros((3,), np.float32)},
               "step": 5}
    ckpt = tmp_path / "task_1_epoch_1"
    ocp.PyTreeCheckpointer().save(str(ckpt), payload)
    final = mod.publish(str(ckpt), str(tmp_path / "model.msgpack"))
    assert os.path.exists(final)
    import re
    assert re.search(r"model-[0-9a-f]{8}\.msgpack$", final)
    from flax.serialization import msgpack_restore
    blob = open(final, "rb").read()
    restored = msgpack_restore(blob)
    assert "params" in restored and "opt_state" not in restored


def test_confusion_matrix_group_results_roundtrip():
    """Non-IL confusion_matrix: results-json grouping + a perfect match
    lands entirely on the diagonal (ref confusion_matrix.py:60-95)."""
    from confusion_matrix import group_results
    from confusion_matrix_il import calculate_confusion_matrix

    cat2label = {11: 0, 22: 1, 33: 2}
    # two images, xywh results matching the GT exactly
    results = [
        dict(image_id=7, category_id=11, bbox=[10, 10, 20, 20], score=.9),
        dict(image_id=7, category_id=33, bbox=[50, 50, 10, 10], score=.8),
        dict(image_id=9, category_id=22, bbox=[0, 0, 30, 30], score=.7),
    ]
    dets = group_results(results, 3, cat2label, [7, 9])
    assert len(dets) == 2 and len(dets[0]) == 3
    assert dets[0][0].shape == (1, 5) and dets[1][1].shape == (1, 5)

    gts = [
        (np.array([[10, 10, 30, 30], [50, 50, 60, 60]], np.float32),
         np.array([0, 2], np.int32)),
        (np.array([[0, 0, 30, 30]], np.float32), np.array([1], np.int32)),
    ]
    cm = calculate_confusion_matrix(gts, dets, 3, score_thr=0.3,
                                    iou_thr=0.5)
    assert cm[0, 0] == 1 and cm[1, 1] == 1 and cm[2, 2] == 1
    assert cm.sum() == 3  # no FPs, no misses


def test_download_dataset_local_move_and_urls(tmp_path):
    """download_dataset: url table sanity + local-file 'download' path
    (no network: a local source file is moved into the save dir)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools", "misc"))
    from download_dataset import DATA2URL, download_one

    assert set(DATA2URL) >= {"coco2017", "voc2007", "lvis"}
    assert all(u.startswith("http") for us in DATA2URL.values()
               for u in us)
    src = tmp_path / "src" / "archive.zip"
    src.parent.mkdir()
    import zipfile
    with zipfile.ZipFile(src, "w") as z:
        z.writestr("inner.txt", "hello")
    dst = tmp_path / "out"
    dst.mkdir()
    download_one(str(src), dst, unzip=True, delete=False)
    assert (dst / "archive.zip").exists()
    assert (dst / "inner.txt").read_text() == "hello"


def test_gen_coco_panoptic_test_info(tmp_path):
    import json
    import subprocess

    (tmp_path / "panoptic_val2017.json").write_text(json.dumps(
        {"categories": [{"id": 1, "isthing": 1}]}))
    (tmp_path / "image_info_test-dev2017.json").write_text(json.dumps(
        {"images": [{"id": 5}], "categories": [{"id": 1}]}))
    script = os.path.join(os.path.dirname(__file__), "..", "tools",
                          "misc", "gen_coco_panoptic_test_info.py")
    subprocess.check_call([sys.executable, script, str(tmp_path)])
    out = json.loads((tmp_path /
                      "panoptic_image_info_test-dev2017.json").read_text())
    assert out["categories"][0]["isthing"] == 1
    assert out["images"] == [{"id": 5}]

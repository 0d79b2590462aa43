"""Native VOC-XML and LVIS dataset loaders + their eval protocols."""
import json
import os

import numpy as np

from dskd_tpu.data.lvis import LvisDataset
from dskd_tpu.data.voc import VOC_CLASSES, VOCDataset


def _write_voc(root, img_id, hw, objects):
    os.makedirs(os.path.join(root, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets", "Main"), exist_ok=True)
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    objs = "".join(
        f"<object><name>{n}</name>"
        f"{'<difficult>1</difficult>' if diff else '<difficult>0</difficult>'}"
        f"<bndbox><xmin>{b[0]}</xmin><ymin>{b[1]}</ymin>"
        f"<xmax>{b[2]}</xmax><ymax>{b[3]}</ymax></bndbox></object>"
        for n, b, diff in objects)
    xml = (f"<annotation><size><width>{hw[1]}</width>"
           f"<height>{hw[0]}</height></size>{objs}</annotation>")
    with open(os.path.join(root, "Annotations", f"{img_id}.xml"), "w") as f:
        f.write(xml)


def test_voc_xml_parse_and_eval(tmp_path):
    root = str(tmp_path)
    _write_voc(root, "000001", (100, 120),
               [("dog", (10, 10, 50, 60), 0),
                ("cat", (60, 20, 110, 80), 0),
                ("dog", (1, 1, 20, 20), 1)])        # difficult -> ignore
    _write_voc(root, "000002", (80, 80), [("person", (5, 5, 40, 40), 0)])
    with open(os.path.join(root, "ImageSets", "Main", "test.txt"),
              "w") as f:
        f.write("000001\n000002\n")

    ds = VOCDataset(root, split="test", test_mode=True)
    assert len(ds) == 2
    path, hw, boxes, labels, _ = ds.get_raw(0)
    assert path.endswith("JPEGImages/000001.jpg")
    assert hw == (100, 120)
    # 1-based inclusive -> 0-based: xmin-1, xmax kept
    np.testing.assert_allclose(boxes[0], [9, 9, 50, 60])
    assert list(labels) == [VOC_CLASSES.index("dog"),
                            VOC_CLASSES.index("cat")]
    ann = ds.get_ann(0)
    assert ann["bboxes_ignore"].shape == (1, 4)

    # perfect detections -> mAP 1.0; the difficult box needs no det
    def dets_for(i):
        out = [np.zeros((0, 5), np.float32) for _ in VOC_CLASSES]
        _, _, b, l, _ = ds.get_raw(i)
        for bb, ll in zip(b, l):
            out[ll] = np.concatenate(
                [out[ll], np.array([[*bb, 0.9]], np.float32)])
        return out

    res = ds.evaluate([dets_for(0), dets_for(1)])
    assert res["mAP"] == 1.0


def _lvis_json(tmp_path):
    cats = [dict(id=1, name="aaa", frequency="r"),
            dict(id=2, name="bbb", frequency="c"),
            dict(id=3, name="ccc", frequency="f")]
    images = [
        dict(id=1, height=100, width=100,
             coco_url="http://images.cocodataset.org/train2017/0001.jpg",
             neg_category_ids=[2], not_exhaustive_category_ids=[]),
        dict(id=2, height=90, width=90, file_name="val/0002.jpg",
             neg_category_ids=[], not_exhaustive_category_ids=[3]),
    ]
    anns = [dict(id=1, image_id=1, category_id=1, bbox=[10, 10, 30, 30],
                 area=900),
            dict(id=2, image_id=2, category_id=3, bbox=[5, 5, 20, 20],
                 area=400)]
    p = str(tmp_path / "lvis.json")
    with open(p, "w") as f:
        json.dump(dict(categories=cats, images=images, annotations=anns),
                  f)
    return p


def test_lvis_load_and_federated_eval(tmp_path):
    ds = LvisDataset(_lvis_json(tmp_path), img_prefix="/data",
                     test_mode=True)
    assert len(ds) == 2
    path, hw, boxes, labels, img_id = ds.get_raw(0)
    assert path == "/data/train2017/0001.jpg"     # from coco_url
    assert hw == (100, 100)
    np.testing.assert_allclose(boxes[0], [10, 10, 40, 40])

    # perfect dets for the GT + a SPURIOUS cat-3 det on image 1 (cat 3 is
    # neither positive nor negative there -> federated rule DROPS it)
    results = {
        1: dict(bboxes=np.array([[10, 10, 40, 40], [0, 0, 50, 50]],
                                np.float32),
                scores=np.array([0.9, 0.95], np.float32),
                labels=np.array([0, 2], np.int32)),
        2: dict(bboxes=np.array([[5, 5, 25, 25]], np.float32),
                scores=np.array([0.8], np.float32),
                labels=np.array([2], np.int32)),
    }
    out = ds.evaluate(results)
    assert out["AP"] == 1.0, out    # spurious det ignored by federation
    assert out["APr"] == 1.0 and out["APf"] == 1.0
    assert np.isnan(out["APc"]) or out["APc"] >= 0  # no cat-2 GT anywhere

    # control: a false positive on an image where its category IS evaluated
    # must still hurt — higher-scored wrong cat-1 det on image 1 (cat 1
    # positive there) depresses cat-1 AP
    results[1] = dict(
        bboxes=np.array([[60, 60, 90, 90], [10, 10, 40, 40]], np.float32),
        scores=np.array([0.99, 0.9], np.float32),
        labels=np.array([0, 0], np.int32))
    out2 = ds.evaluate(results)
    assert out2["AP"] < 1.0, out2


def test_cityscapes_wrapper(tmp_path):
    """CityscapesDataset = COCO-format annotations bound to the 8 traffic
    classes in the given (non-alphabetical) order."""
    import json as _json

    from dskd_tpu.data.cityscapes import (CITYSCAPES_CLASSES,
                                          CityscapesDataset)
    cats = [dict(id=i + 10, name=n)
            for i, n in enumerate(CITYSCAPES_CLASSES)]
    data = dict(
        categories=cats,
        images=[dict(id=1, file_name="munich_0.png", height=64,
                     width=64)],
        annotations=[dict(id=1, image_id=1, category_id=12,   # "car"
                          bbox=[4, 4, 20, 16], area=320, iscrowd=0)])
    p = str(tmp_path / "cs.json")
    with open(p, "w") as f:
        _json.dump(data, f)
    ds = CityscapesDataset(p, test_mode=True)
    assert ds.CLASSES == CITYSCAPES_CLASSES or tuple(
        ds.PRED_CLASSES) == CITYSCAPES_CLASSES
    _, hw, boxes, labels, _ = ds.get_raw(0)
    assert hw == (64, 64)
    assert int(labels[0]) == CITYSCAPES_CLASSES.index("car")


def test_openimages_loader_and_hierarchy(tmp_path):
    """CSV parsing, normalized->pixel boxes, group-of->ignore, ancestor
    expansion of both GT and detections."""
    from dskd_tpu.data.openimages import OpenImagesDataset

    (tmp_path / "cls.csv").write_text(
        "/m/animal,Animal\n/m/cat,Cat\n/m/car,Car\n")
    (tmp_path / "hier.json").write_text(_json_dump({
        "LabelName": "/m/entity", "Subcategory": [
            {"LabelName": "/m/animal",
             "Subcategory": [{"LabelName": "/m/cat"}]},
            {"LabelName": "/m/car"}]}))
    (tmp_path / "ann.csv").write_text(
        "ImageID,LabelName,XMin,XMax,YMin,YMax,IsGroupOf\n"
        "img1,/m/cat,0.1,0.5,0.2,0.6,0\n"
        "img1,/m/car,0.0,0.3,0.0,0.3,1\n")

    ds = OpenImagesDataset(str(tmp_path / "ann.csv"),
                           str(tmp_path / "cls.csv"),
                           hierarchy_file=str(tmp_path / "hier.json"),
                           image_dims={"img1": (100, 200)},
                           test_mode=True)
    assert ds.CLASSES == ("Animal", "Cat", "Car")
    _, hw, boxes, labels, _ = ds.get_raw(0)
    assert hw == (100, 200)
    np.testing.assert_allclose(boxes[0], [20, 20, 100, 60])   # *w, *h
    assert list(labels) == [1]                                # Cat
    ann = ds.get_ann(0)
    # gt expanded: Cat + ancestor Animal; group-of car -> ignore
    assert sorted(ann["labels"].tolist()) == [0, 1]
    assert ann["bboxes_ignore"].shape == (1, 4)

    # perfect Cat detection scores mAP 1.0 on BOTH Cat and Animal
    dets = [np.zeros((0, 5), np.float32) for _ in range(3)]
    dets[1] = np.array([[20, 20, 100, 60, 0.9]], np.float32)
    res = ds.evaluate([dets])
    assert res["mAP"] == 1.0


def _json_dump(obj):
    import json as _j
    return _j.dumps(obj)


def test_wider_face_layout(tmp_path):
    """WIDER-Face VOC-XML binding: folder-tag image paths, face class
    (datasets/wider_face.py layout)."""
    import os
    from dskd_tpu.data.voc import WIDERFaceDataset

    (tmp_path / "Annotations").mkdir()
    (tmp_path / "train.txt").write_text("img0\nimg1\n")
    xml = """<annotation><folder>{f}</folder>
<size><width>80</width><height>60</height></size>
{objs}</annotation>"""
    obj = ("<object><name>face</name><bndbox><xmin>10</xmin>"
           "<ymin>10</ymin><xmax>30</xmax><ymax>30</ymax></bndbox>"
           "</object>")
    (tmp_path / "Annotations" / "img0.xml").write_text(
        xml.format(f="0--Parade", objs=obj + obj))
    (tmp_path / "Annotations" / "img1.xml").write_text(
        xml.format(f="1--Handshaking", objs=""))
    ds = WIDERFaceDataset(str(tmp_path), split="train")
    assert len(ds) == 1                      # empty image filtered
    p, hw, b, l, _ = ds.get_raw(0)
    assert p.endswith(os.path.join("0--Parade", "img0.jpg"))
    assert hw == (60, 80) and b.shape == (2, 4)
    assert (l == 0).all()

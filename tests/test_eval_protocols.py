"""Eval-protocol fixes: the RPN families score class-agnostically (the
reference's metric='proposal'), and fast_rcnn has an eval path (static
proposal-grid stand-in for the reference's proposal files)."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def _fixture(tmp_path):
    from dskd_tpu.data.coco import (COCO_CLASSES_ALPHA_ORDER,
                                    TaskCocoDataset)
    cats = [{"id": cid, "name": n} for n, cid in COCO_CLASSES_ALPHA_ORDER]
    images = [{"id": i + 1, "file_name": f"{i}.jpg", "width": 64,
               "height": 64} for i in range(2)]
    # GT spread over TWO different categories — the agnostic protocol
    # must match proposals against both
    anns = [{"id": 1, "image_id": 1, "category_id": 5,
             "bbox": [8, 8, 24, 24], "area": 576, "iscrowd": 0},
            {"id": 2, "image_id": 2, "category_id": 2,
             "bbox": [20, 20, 24, 24], "area": 576, "iscrowd": 0}]
    ann = os.path.join(str(tmp_path), "ann.json")
    with open(ann, "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": cats}, f)
    return TaskCocoDataset(ann, catsplit=(4,), catload=(1,),
                           test_mode=True)


def test_rpn_eval_is_class_agnostic(tmp_path, monkeypatch):
    import dskd_tpu.data.loader as loader_mod
    from dskd_tpu.data.loader import DataLoader
    from dskd_tpu.data.pipeline import PipelineConfig
    from dskd_tpu.eval.evaluator import evaluate
    from dskd_tpu.models.faster_rcnn import RPN

    ds = _fixture(tmp_path)
    monkeypatch.setattr(loader_mod, "load_image",
                        lambda p: np.zeros((64, 64, 3), np.uint8))
    dl = DataLoader(ds, batch_size=2, train=False,
                    pipeline=PipelineConfig(max_gt=4, bucket=(64, 64),
                                            img_scale=(64, 64)))
    model = RPN(depth=18)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   jnp.asarray([[64, 64]], np.int32))
    stats = evaluate(model, v, ds, dl, arch="rpn", max_per_img=100)
    # proposal protocol: AR@k present and every stat finite (per-class
    # scoring would only ever see ONE of the two GT categories)
    assert any(k.startswith("AR@") for k in stats)
    assert all(np.isfinite(val) for val in stats.values())


def test_fast_rcnn_eval_step_grid_proposals():
    from dskd_tpu.eval.evaluator import make_eval_step
    from dskd_tpu.models.faster_rcnn import FasterRCNN

    model = FasterRCNN(num_classes=6, depth=18, with_rpn=False)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   jnp.asarray([[64, 64]], np.int32),
                   method=FasterRCNN.init_all)
    eval_step = make_eval_step(model, max_per_img=10, arch="fast_rcnn")
    images = jnp.zeros((2, 64, 64, 3), jnp.float32)
    img_hw = jnp.asarray(np.tile([[64, 64]], (2, 1)).astype(np.int32))
    det = eval_step(v, images, img_hw, jnp.ones((2, 4), jnp.float32))
    assert det.bboxes.shape == (2, 10, 4)
    assert np.isfinite(np.asarray(det.scores)).all()

"""Serving handler: image bytes in -> torchserve-style JSON payload out."""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools",
                                "deployment"))

from dskd_tpu.data.coco import COCO_CLASSES_ALPHA_ORDER  # noqa: E402


def test_serve_handler(tmp_path):
    import cv2

    from serve import build_handler
    from dskd_tpu.utils.config import (DataConfig, ExperimentConfig,
                                       ModelConfig, TrainConfig)

    # tiny dataset json so PRED_CLASSES resolves class names
    cats = [{"id": cid, "name": n} for n, cid in COCO_CLASSES_ALPHA_ORDER]
    ann = {"images": [{"id": 1, "file_name": "x.jpg",
                       "width": 64, "height": 64}],
           "annotations": [{"id": 1, "image_id": 1, "category_id": 5,
                            "bbox": [2, 2, 20, 20], "area": 400,
                            "iscrowd": 0}],
           "categories": cats}
    ann_f = tmp_path / "ann.json"
    ann_f.write_text(json.dumps(ann))

    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=4, num_query=16, depth=18,
                          num_encoder_layers=1, num_decoder_layers=1,
                          num_levels=4, dropout=0.0),
        data=DataConfig(train_ann=str(ann_f), val_ann=str(ann_f),
                        train_img_prefix=str(tmp_path),
                        val_img_prefix=str(tmp_path),
                        catsplit=(2, 2), samples_per_device=1,
                        num_workers=0, max_gt=8, bucket=(64, 64),
                        img_scale=(64, 64)),
        train=TrainConfig(work_dir=str(tmp_path / "work")),
    )
    handle = build_handler(cfg, score_thr=0.0, random_init=True)

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (48, 56, 3), np.uint8)
    ok, enc = cv2.imencode(".jpg", img)
    assert ok
    out = handle(enc.tobytes())
    assert isinstance(out, list)
    for det in out:
        assert set(det) == {"class_name", "bbox", "score"}
        assert len(det["bbox"]) == 4
        json.dumps(det)            # payload is JSON-serializable


def test_export_stablehlo_zoo_family(tmp_path):
    """tools/deployment/export_model.py surface: the family-dispatched
    eval step exports to StableHLO and round-trips for a NON-flagship
    family (retinanet), proving the whole zoo shares the export path."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from dskd_tpu.eval.evaluator import make_eval_step
    from dskd_tpu.train.incremental import build_model, init_variables
    from dskd_tpu.utils.config import ExperimentConfig, ModelConfig

    cfg = ExperimentConfig(model=ModelConfig(arch="retinanet",
                                             num_classes=8, depth=18))
    cfg.data = dataclasses.replace(cfg.data, bucket=(64, 64),
                                   img_scale=(64, 64))
    model = build_model(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    eval_step = make_eval_step(model, max_per_img=10, arch="retinanet")
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    img_hw = jnp.asarray(np.array([[64, 64]], np.int32))
    sf = jnp.ones((1, 4), jnp.float32)

    def infer(images, img_hw):
        det = eval_step(variables, images, img_hw, sf)
        return det.bboxes, det.scores, det.labels, det.valid

    exported = jexport.export(jax.jit(infer))(images, img_hw)
    blob = exported.serialize()
    assert len(blob) > 1000
    reloaded = jexport.deserialize(blob)
    outs = reloaded.call(images, img_hw)
    ref = infer(images, img_hw)
    for a, b in zip(outs, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

"""apis/inference.py: init_detector / inference_detector /
async_inference_detector (parity: the reference's demo path,
apis/inference.py:17/92/158)."""
import asyncio
import dataclasses

import numpy as np


def _tiny_cfg():
    from dskd_tpu.utils.config import ExperimentConfig
    cfg = ExperimentConfig()
    cfg.model = dataclasses.replace(
        cfg.model, depth=18, num_query=8, num_encoder_layers=1,
        num_decoder_layers=1)
    cfg.data = dataclasses.replace(
        cfg.data, bucket=(64, 64), img_scale=(64, 64), max_gt=4,
        aspect_buckets=None, multi_scales=None)
    return cfg


def test_inference_detector_sync_and_async():
    from dskd_tpu.apis.inference import (async_inference_detector,
                                         inference_detector,
                                         init_detector)

    cfg = _tiny_cfg()
    model, variables, cfg = init_detector(cfg)
    img = (np.random.RandomState(0).rand(48, 64, 3) * 255).astype(
        np.float32)

    res = inference_detector(model, variables, cfg, img)
    assert len(res) == cfg.model.num_classes
    assert all(r.ndim == 2 and r.shape[1] == 5 for r in res)

    # batch form: list in -> list of per-image results
    res2 = inference_detector(model, variables, cfg, [img, img])
    assert len(res2) == 2 and len(res2[0]) == cfg.model.num_classes

    # async variant returns the same structure through the event loop
    res3 = asyncio.run(async_inference_detector(model, variables, cfg,
                                                img))
    assert len(res3) == cfg.model.num_classes
    for a, b in zip(res, res3):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

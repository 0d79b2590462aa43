"""Inference API (parity: mmdet/apis/inference.py).

``init_detector(config, ckpt)`` -> (model, variables, cfg);
``inference_detector(...)`` takes raw images (paths or arrays) through the
test pipeline and returns per-class box lists in the reference's
``bbox2result`` format: a list of (n_i, 5) [x1 y1 x2 y2 score] arrays, one
per class. ``show_result`` draws them.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import PipelineConfig, load_image, preprocess
from ..models.gfl_detr_head import get_bboxes
from ..train.checkpoint import find_latest_checkpoint, restore_checkpoint
from ..utils.config import ExperimentConfig, load_config


def init_detector(config: Union[str, ExperimentConfig],
                  checkpoint: Optional[str] = None,
                  task: Optional[int] = None):
    """Build the model and load weights; returns (model, variables, cfg)."""
    from ..train.incremental import build_model, init_variables

    cfg = load_config(config) if isinstance(config, str) else config
    model = build_model(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    if checkpoint:
        import re
        m = re.search(r"task_(\d+)_epoch_(\d+)", checkpoint)
        if m:
            import os
            restored = restore_checkpoint(
                os.path.dirname(checkpoint.rstrip("/")) or ".",
                int(m.group(1)), int(m.group(2)),
                template={"params": variables["params"],
                          "batch_stats": variables.get("batch_stats", {}),
                          "opt_state": None, "step": 0})
            variables = {"params": restored["params"],
                         "batch_stats": restored["batch_stats"]}
    return model, variables, cfg


def inference_detector(model, variables, cfg: ExperimentConfig,
                       imgs: Union[str, np.ndarray, Sequence],
                       score_thr: float = 0.0) -> List[List[np.ndarray]]:
    """Run inference; returns per-image lists of per-class (n, 5) arrays."""
    single = isinstance(imgs, (str, np.ndarray))
    if single:
        imgs = [imgs]
    pipe = PipelineConfig(img_scale=cfg.data.img_scale, flip_ratio=0.0,
                          max_gt=1, bucket=cfg.data.bucket)
    batch_imgs, hw, sf = [], [], []
    for im in imgs:
        arr = load_image(im) if isinstance(im, str) else np.asarray(im)
        out = preprocess(arr, np.zeros((0, 4), np.float32),
                         np.zeros((0,), np.int32), pipe, None, train=False)
        batch_imgs.append(out["image"])
        hw.append(out["img_hw"])
        sf.append(out["scale_factor"])

    images = jnp.asarray(np.stack(batch_imgs))
    img_hw = jnp.asarray(np.stack(hw))
    out = model.apply(variables, images, img_hw, deterministic=True)
    det = get_bboxes(out.head.cls_scores[-1], out.head.bbox_preds[-1],
                     img_hw, scale_factor=jnp.asarray(np.stack(sf)),
                     reg_max=cfg.model.reg_max, score_thr=score_thr,
                     max_per_img=cfg.test_max_per_img, rescale=True)

    results = []
    num_classes = cfg.model.num_classes
    for i in range(len(imgs)):
        boxes = np.asarray(det.bboxes[i])
        scores = np.asarray(det.scores[i])
        labels = np.asarray(det.labels[i])
        valid = np.asarray(det.valid[i])
        per_class = []
        for c in range(num_classes):
            m = valid & (labels == c)
            per_class.append(
                np.concatenate([boxes[m], scores[m, None]], -1)
                if m.any() else np.zeros((0, 5), np.float32))
        results.append(per_class)
    return results[0] if single else results


def show_result(img: Union[str, np.ndarray], result: List[np.ndarray],
                class_names: Optional[Sequence[str]] = None,
                score_thr: float = 0.3, out_file: Optional[str] = None):
    """Draw detections (parity: show_result_pyplot without the GUI)."""
    import cv2

    arr = load_image(img) if isinstance(img, str) else np.array(img)
    draw = arr.copy()
    rng = np.random.RandomState(42)
    palette = rng.randint(0, 255, (len(result), 3)).tolist()
    for c, dets in enumerate(result):
        for x1, y1, x2, y2, s in dets:
            if s < score_thr:
                continue
            color = tuple(int(v) for v in palette[c])
            cv2.rectangle(draw, (int(x1), int(y1)), (int(x2), int(y2)),
                          color, 2)
            name = class_names[c] if class_names else str(c)
            cv2.putText(draw, f"{name}:{s:.2f}", (int(x1), int(y1) - 3),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    if out_file:
        cv2.imwrite(out_file, cv2.cvtColor(draw, cv2.COLOR_RGB2BGR))
    return draw


async def async_inference_detector(model, variables,
                                   cfg: ExperimentConfig, imgs,
                                   score_thr: float = 0.0):
    """Async variant (parity: apis/inference.py:158
    async_inference_detector — the reference releases the GIL into a
    CUDA-stream concurrency scaffold). JAX dispatch is already
    asynchronous; what blocks is the host fetch of the results, so the
    whole call runs in a worker thread and the event loop stays free to
    preprocess / serve other requests meanwhile."""
    import asyncio

    return await asyncio.to_thread(inference_detector, model, variables,
                                   cfg, imgs, score_thr)

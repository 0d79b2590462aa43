"""Detection visualization (host-side numpy/cv2 — no device work).

Parity targets:
  * mmdet/core/visualization/palette.py:1-63 — named palettes resolved to
    per-class BGR tuples (we stay RGB end-to-end and convert at imwrite).
  * mmdet/core/visualization/image.py `imshow_det_bboxes` (:127-~300) —
    score-thresholded class-colored boxes + 'label|score' text.
  * `imshow_gt_det_bboxes` (:~330-527) — ground truth and detections drawn
    side by side for qualitative error inspection.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import numpy as np


def get_palette(palette: Union[str, int, Tuple[int, int, int]],
                num_classes: int) -> List[Tuple[int, int, int]]:
    """Resolve a palette spec to num_classes RGB tuples.

    'random' uses the reference's seeded shuffle idea (deterministic here);
    a single RGB tuple paints every class the same; an int seeds random.
    """
    if isinstance(palette, tuple):
        return [palette] * num_classes
    seed = palette if isinstance(palette, int) else 42
    rng = np.random.RandomState(seed)
    return [tuple(int(v) for v in c)
            for c in rng.randint(0, 255, (num_classes, 3))]


def imshow_det_bboxes(img: np.ndarray,
                      bboxes: np.ndarray,
                      labels: np.ndarray,
                      class_names: Optional[Sequence[str]] = None,
                      score_thr: float = 0.0,
                      palette: Union[str, int] = "random",
                      thickness: int = 2,
                      out_file: Optional[str] = None) -> np.ndarray:
    """Draw (N, 4|5) xyxy[+score] boxes with (N,) labels onto an RGB image.

    Returns the drawn copy; writes ``out_file`` (BGR) when given.
    """
    import cv2

    draw = np.ascontiguousarray(img).copy()
    n_cls = int(labels.max()) + 1 if len(labels) else 1
    colors = get_palette(palette, max(n_cls, 1))
    scores = bboxes[:, 4] if bboxes.shape[-1] == 5 else None
    for i in range(len(bboxes)):
        if scores is not None and scores[i] < score_thr:
            continue
        x1, y1, x2, y2 = (int(v) for v in bboxes[i, :4])
        c = colors[int(labels[i]) % len(colors)]
        cv2.rectangle(draw, (x1, y1), (x2, y2), c, thickness)
        name = (class_names[int(labels[i])] if class_names
                else str(int(labels[i])))
        text = f"{name}|{scores[i]:.02f}" if scores is not None else name
        cv2.putText(draw, text, (x1, max(y1 - 3, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, c, 1)
    if out_file:
        cv2.imwrite(out_file, cv2.cvtColor(draw, cv2.COLOR_RGB2BGR))
    return draw


def imshow_gt_det_bboxes(img: np.ndarray,
                         gt_bboxes: np.ndarray,
                         gt_labels: np.ndarray,
                         det_result: List[np.ndarray],
                         class_names: Optional[Sequence[str]] = None,
                         score_thr: float = 0.3,
                         out_file: Optional[str] = None) -> np.ndarray:
    """GT (left panel, one color) vs detections (right panel, per-class
    palette), concatenated horizontally — the reference's side-by-side
    error-inspection view (image.py imshow_gt_det_bboxes).

    det_result: per-class list of (k, 5) arrays (the bbox2result format).
    """
    gt_panel = imshow_det_bboxes(img, gt_bboxes, gt_labels, class_names,
                                 palette=(72, 191, 101))
    if det_result:
        det_bboxes = np.concatenate(
            [np.asarray(d).reshape(-1, 5) for d in det_result], axis=0)
        det_labels = np.concatenate(
            [np.full(len(np.asarray(d).reshape(-1, 5)), c, np.int64)
             for c, d in enumerate(det_result)])
    else:
        det_bboxes = np.zeros((0, 5), np.float32)
        det_labels = np.zeros((0,), np.int64)
    det_panel = imshow_det_bboxes(img, det_bboxes, det_labels, class_names,
                                  score_thr=score_thr)
    both = np.concatenate([gt_panel, det_panel], axis=1)
    if out_file:
        import cv2
        cv2.imwrite(out_file, cv2.cvtColor(both, cv2.COLOR_RGB2BGR))
    return both

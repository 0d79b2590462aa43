from .coco_eval import CocoDetectionEval  # noqa: F401

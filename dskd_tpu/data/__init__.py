from .coco import CocoAnnotations, TaskCocoDataset  # noqa: F401
from .loader import DataLoader  # noqa: F401

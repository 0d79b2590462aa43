"""Native (C++) runtime components, loaded via ctypes with lazy builds.

The reference's native runtime lives in mmcv / pycocotools C extensions;
here the host-side hot loops (COCO eval matching) are C++ with a pure-numpy
fallback when no compiler is available.
"""
from .build import load_library  # noqa: F401

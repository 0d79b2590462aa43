"""Build + load the native library (ctypes, no pybind11 needed)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_HERE, "libcoco_match.so")
_SRC = os.path.join(_HERE, "coco_match.cpp")
_lock = threading.Lock()
_lib = None
_failed = False


def load_library():
    """Compile on first use; returns the ctypes lib or None on failure."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["c++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB)
            lib.coco_match.restype = None
            lib.bbox_iou.restype = None
            _lib = lib
        except Exception:
            _failed = True
    return _lib

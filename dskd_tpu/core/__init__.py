from . import boxes, coders, integral, losses, matching, postprocess  # noqa: F401

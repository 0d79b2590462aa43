from . import boxes, integral, losses, matching, postprocess  # noqa: F401

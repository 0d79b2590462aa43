from .inference import (inference_detector, init_detector,  # noqa: F401
                        show_result)

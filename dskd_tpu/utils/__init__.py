from .config import ExperimentConfig, load_config  # noqa: F401

from .optim import make_optimizer  # noqa: F401
from .schedule import step_lr_schedule  # noqa: F401
from .state import TrainState  # noqa: F401

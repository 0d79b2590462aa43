from .channel_mapper import ChannelMapper  # noqa: F401
from .positional import sine_positional_encoding  # noqa: F401
from .resnet import ResNet  # noqa: F401

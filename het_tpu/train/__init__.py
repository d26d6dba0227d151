from .config import TrainConfig, add_args, config_from_args  # noqa: F401
from .driver import build_model, train  # noqa: F401
from .link import train_link  # noqa: F401
from .minibatch import train_minibatch  # noqa: F401

"""Training/eval runtime: config, losses, optimizers, trainer, checkpoints."""

from pmce_tpu.core.config import Config, load_config  # noqa: F401
from pmce_tpu.core import losses, optim, checkpoint  # noqa: F401
from pmce_tpu.core.trainer import Trainer, TrainState  # noqa: F401

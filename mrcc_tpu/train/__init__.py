"""Training: losses, optax trainers, checkpointing."""

from . import checkpoint, losses, trainer  # noqa: F401
from .checkpoint import checkpoint_restore, checkpoint_save  # noqa: F401
from .losses import LossConfig, LossType, get_criterion, segmentation_loss  # noqa: F401
from .trainer import (  # noqa: F401
    TrainConfig,
    Trainer,
    TrainState,
    make_pose_train_step,
    make_segmentation_train_step,
    resolve_conv_impl,
)

"""Jitted training engines, LR schedules, checkpoints."""

from .trainer import (  # noqa: F401
    FoldTrainer,
    TrainConfig,
    make_batches,
    train_single_fold,
)
from .streaming import StreamingFoldTrainer  # noqa: F401
from .schedules import cyclic_triangular  # noqa: F401
from .checkpoints import (  # noqa: F401
    checkpoint_exists,
    load_checkpoint,
    save_checkpoint,
)

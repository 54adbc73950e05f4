"""Fine-tuning loop (new capability; the reference is inference-only)."""

from . import checkpoint, trainer
from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
from .trainer import TrainConfig, Trainer, make_optimizer

"""Fine-tuning loop (new capability; the reference is inference-only)."""

from . import trainer
from .trainer import TrainConfig, Trainer, make_optimizer

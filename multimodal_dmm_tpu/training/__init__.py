"""Training runtime: trainer, loaders, checkpointing, diagnostics."""

from .trainer import Trainer
from .loader import BatchLoader
from .checkpoint import save_checkpoint, load_checkpoint

"""High-level pipelines ("model families") over the device ops:
batched solving, spectral analysis, preconditioner training."""

from .solver import (
    BatchedSolver,
    TrainState,
    init_train_state,
    make_training_step,
)
from .jordan import JordanReport, jordan_analysis
from .spectral import SpectralReport, spectral_pipeline

__all__ = [
    "BatchedSolver",
    "TrainState",
    "init_train_state",
    "make_training_step",
    "SpectralReport",
    "spectral_pipeline",
    "JordanReport",
    "jordan_analysis",
]

"""Neural training layer: configs, dataset building, trainers, PSO."""

from wtracker_tpu.neural.config import LOSSES, OPTIMIZERS, DatasetConfig, IOConfig, TrainConfig
from wtracker_tpu.neural.dataset import NumpyDataset
from wtracker_tpu.neural.optimize import PSOResult, optimize_polyfit_weights, particle_swarm
from wtracker_tpu.neural.train_results import BatchResult, EpochResult, FitResult
from wtracker_tpu.neural.training import MLPTrainer, Trainer, fit_from_config

__all__ = [
    "LOSSES",
    "OPTIMIZERS",
    "DatasetConfig",
    "IOConfig",
    "TrainConfig",
    "NumpyDataset",
    "PSOResult",
    "optimize_polyfit_weights",
    "particle_swarm",
    "BatchResult",
    "EpochResult",
    "FitResult",
    "MLPTrainer",
    "Trainer",
    "fit_from_config",
]

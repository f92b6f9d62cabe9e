"""Closed-loop simulation core: configs, view geometry, motors, simulator, engine."""

from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
from wtracker_tpu.sim.motor import MotorController, SineMotorController, StepMotorController
from wtracker_tpu.sim.simulator import SimController, Simulator
from wtracker_tpu.sim.view import ViewController

__all__ = [
    "ExperimentConfig",
    "TimingConfig",
    "MotorController",
    "SineMotorController",
    "StepMotorController",
    "SimController",
    "Simulator",
    "ViewController",
]

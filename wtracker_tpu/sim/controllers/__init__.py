"""Tracking controllers for the closed-loop simulator.

Parity with the reference ``wtracker/sim/sim_controllers/__init__.py:1-6``.
"""

from wtracker_tpu.sim.controllers.csv import CsvController
from wtracker_tpu.sim.controllers.logging import LogConfig, LoggingController
from wtracker_tpu.sim.controllers.mlp import MLPController
from wtracker_tpu.sim.controllers.optimal import OptimalController
from wtracker_tpu.sim.controllers.polyfit import PolyfitConfig, PolyfitController, WeightEvaluator
from wtracker_tpu.sim.controllers.yolo import YoloConfig, YoloController

__all__ = [
    "CsvController",
    "LogConfig",
    "LoggingController",
    "MLPController",
    "OptimalController",
    "PolyfitConfig",
    "PolyfitController",
    "WeightEvaluator",
    "YoloConfig",
    "YoloController",
]

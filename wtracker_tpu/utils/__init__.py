"""Host-side utilities: bbox math, configs, frame IO, logging, async saving."""

from wtracker_tpu.utils.bbox import BoxConverter, BoxFormat, BoxUtils
from wtracker_tpu.utils.config_base import ConfigBase, print_initialization
from wtracker_tpu.utils.frame_reader import ArrayReader, DummyReader, FrameReader, FrameStream
from wtracker_tpu.utils.log_utils import CSVLogger
from wtracker_tpu.utils.profiling import StageTimer, device_trace
from wtracker_tpu.utils.threading_utils import TaskScheduler, TqdmQueue, adjust_num_workers

__all__ = [
    "BoxConverter",
    "BoxFormat",
    "BoxUtils",
    "ConfigBase",
    "print_initialization",
    "ArrayReader",
    "DummyReader",
    "FrameReader",
    "FrameStream",
    "CSVLogger",
    "StageTimer",
    "device_trace",
    "TaskScheduler",
    "TqdmQueue",
    "adjust_num_workers",
]

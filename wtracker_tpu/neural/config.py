"""Neural-training configuration dataclasses.

Capability parity with the reference ``wtracker/neural/config.py`` —
``DatasetConfig`` (11-25), ``TrainConfig`` (41-73) and ``IOConfig`` (76-103),
plus the optimizer/loss registries (28-38) re-targeted at optax.

Behavioral invariant (SURVEY.md §7 item 8): ``in_dim = 4·|input_frames|``
(bbox per input frame) and ``out_dim = 2·|pred_frames|`` (center per predicted
frame).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import optax

from wtracker_tpu.utils.config_base import ConfigBase


@dataclass
class DatasetConfig(ConfigBase):
    input_frames: list[int]
    """Frame offsets fed to the network (0 = the prediction frame, negatives
    are in the past)."""

    pred_frames: list[int]
    """Frame offsets the network predicts (relative to the prediction frame)."""

    log_path: str
    """Path to the log CSV holding worm-head detections."""

    def __post_init__(self) -> None:
        if self.input_frames[0] != 0:
            print(
                "WARNING::DatasetConfig::input_frames should contain 0 as first element. "
                "Please verify your parameters."
            )

    @staticmethod
    def from_io_config(io: "IOConfig", log_path: str) -> "DatasetConfig":
        return DatasetConfig(io.input_frames, io.pred_frames, log_path)


OPTIMIZERS = {
    "adam": optax.adam,
    "sgd": optax.sgd,
    "rmsprop": optax.rmsprop,
    "adamw": optax.adamw,
}

LOSSES = {
    "mse": lambda pred, target: ((pred - target) ** 2).mean(),
    "l1": lambda pred, target: abs(pred - target).mean(),
}


@dataclass
class TrainConfig(ConfigBase):
    """Full training recipe for the movement predictor."""

    dataset: DatasetConfig
    model: object | str  # a model spec/predictor, or a checkpoint path
    loss_fn: str = "mse"
    optimizer: str = "adam"
    device: str = "tpu"
    log: bool = False

    seed: int = field(default=42, kw_only=True)

    num_epochs: int = 100
    checkpoints: str | None = None
    early_stopping: int | None = None
    print_every: int = 5

    learning_rate: float = 0.001
    weight_decay: float = 1e-5

    batch_size: int = 256
    shuffle: bool = True
    num_workers: int = 0
    train_test_split: float = 0.8


@dataclass
class IOConfig(ConfigBase):
    """Input/output contract of the predictor network.

    Each input frame contributes 4 features (the worm bbox); each predicted
    frame contributes 2 outputs (the worm center).
    """

    input_frames: list[int]
    pred_frames: list[int]

    in_dim: int = field(init=False)
    out_dim: int = field(init=False)

    def __post_init__(self):
        if 0 not in self.input_frames:
            print(
                "WARNING::IOConfig::input_frames doesn't contain 0 (the prediction frame). "
                "Please verify your parameters."
            )
        self.in_dim = len(self.input_frames) * 4
        self.out_dim = len(self.pred_frames) * 2

    @staticmethod
    def from_datasetConfig(config: DatasetConfig) -> "IOConfig":
        return IOConfig(config.input_frames, config.pred_frames)

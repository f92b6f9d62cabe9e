"""Neural-training configuration dataclasses.

Capability parity with the reference ``wtracker/neural/config.py`` —
``DatasetConfig`` (11-25), ``TrainConfig`` (41-73) and ``IOConfig`` (76-103),
plus the optimizer/loss registries (28-38) re-targeted at optax.

The field schema (names, defaults, derived ``in_dim``/``out_dim`` persisted
into JSON) is the compatibility contract with reference-written config files;
everything else is free to differ. Behavioral invariant (SURVEY.md §7 item 8):
``in_dim = BBOX_FEATURES·|input_frames|`` and
``out_dim = CENTER_FEATURES·|pred_frames|``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import optax

from wtracker_tpu.utils.config_base import ConfigBase

# Feature widths per frame offset: a full bbox going in, a center coming out.
BBOX_FEATURES = 4
CENTER_FEATURES = 2


def _config_warning(scope: str, detail: str) -> None:
    # The reference signals misconfiguration on stdout rather than raising;
    # keep that contract (notebook users watch the cell output).
    print(f"WARNING::{scope}::{detail} Please verify your parameters.")


@dataclass
class IOConfig(ConfigBase):
    """Input/output contract of the predictor network.

    Frame offsets are relative to the prediction frame (0); negative offsets
    look into the past. Each input frame contributes ``BBOX_FEATURES``
    features, each predicted frame ``CENTER_FEATURES`` outputs.
    """

    input_frames: list[int]
    pred_frames: list[int]

    in_dim: int = field(init=False)
    out_dim: int = field(init=False)

    def __post_init__(self):
        if 0 not in self.input_frames:
            _config_warning("IOConfig", "input_frames doesn't contain 0 (the prediction frame).")
        self.in_dim = BBOX_FEATURES * len(self.input_frames)
        self.out_dim = CENTER_FEATURES * len(self.pred_frames)

    @classmethod
    def from_datasetConfig(cls, config: "DatasetConfig") -> "IOConfig":
        return cls(config.input_frames, config.pred_frames)


@dataclass
class DatasetConfig(ConfigBase):
    """Where the training pairs come from: frame offsets + the source log."""

    input_frames: list[int]
    """Frame offsets fed to the network (0 = the prediction frame, negatives
    are in the past)."""

    pred_frames: list[int]
    """Frame offsets the network predicts (relative to the prediction frame)."""

    log_path: str
    """Path to the log CSV holding worm-head detections."""

    def __post_init__(self) -> None:
        if self.input_frames[0] != 0:
            _config_warning("DatasetConfig", "input_frames should contain 0 as first element.")

    @classmethod
    def from_io_config(cls, io: IOConfig, log_path: str) -> "DatasetConfig":
        return cls(io.input_frames, io.pred_frames, log_path)


# Named recipes accepted by TrainConfig. The optax constructors take
# (learning_rate, ...); losses are plain jnp-compatible reductions.
OPTIMIZERS = {name: getattr(optax, name) for name in ("adam", "sgd", "rmsprop", "adamw")}

LOSSES = {
    "mse": lambda pred, target: ((pred - target) ** 2).mean(),
    "l1": lambda pred, target: abs(pred - target).mean(),
}


@dataclass
class TrainConfig(ConfigBase):
    """Full training recipe for the movement predictor.

    Schema-compatible with the reference TrainConfig (neural/config.py:41-73)
    minus its torch DataLoader fields; ``device`` defaults to "tpu" here.
    """

    dataset: DatasetConfig
    model: object | str  # a model spec/predictor, or a checkpoint path
    loss_fn: str = "mse"  # key into LOSSES
    optimizer: str = "adam"  # key into OPTIMIZERS
    device: str = "tpu"
    log: bool = False  # tensorboard logging on/off

    seed: int = field(default=42, kw_only=True)

    # fitting schedule
    num_epochs: int = 100
    checkpoints: str | None = None
    early_stopping: int | None = None
    print_every: int = 5

    # optimizer knobs
    learning_rate: float = 0.001
    weight_decay: float = 1e-5

    # batching
    batch_size: int = 256
    shuffle: bool = True
    num_workers: int = 0
    train_test_split: float = 0.8

"""Golden parity: our host Simulator vs the upstream reference implementation.

The reference runs READ-ONLY from /root/reference as a behavioral oracle on
synthetic trajectories; our rebuild must produce bit-identical bboxes.csv logs
(the compatibility contract, SURVEY.md §5).
"""

import numpy as np
import pandas as pd
import pytest

from tests.reference_harness import import_reference, make_reference_configs
from tests.synthetic import EXP_KWARGS, TIMING_KWARGS, make_worm_csv


def _run_reference(tmp_path, worm_csv, controller_name, **ctl_kwargs) -> pd.DataFrame:
    import_reference()
    from wtracker.sim.config import ExperimentConfig, TimingConfig  # noqa
    from wtracker.sim.sim_controllers.csv_controller import CsvController
    from wtracker.sim.sim_controllers.logging_controller import LogConfig, LoggingController
    from wtracker.sim.sim_controllers.optimal_controller import OptimalController
    from wtracker.sim.sim_controllers.polyfit_controller import PolyfitConfig, PolyfitController
    from wtracker.sim.simulator import Simulator

    exp, timing = make_reference_configs(EXP_KWARGS, TIMING_KWARGS)

    if controller_name == "csv":
        inner = CsvController(timing, worm_csv)
    elif controller_name == "optimal":
        inner = OptimalController(timing, worm_csv)
    elif controller_name == "polyfit":
        cfg = PolyfitConfig(**ctl_kwargs)
        inner = PolyfitController(timing, cfg, worm_csv)

    root = tmp_path / "ref"
    ctl = LoggingController(inner, LogConfig(root_folder=str(root), save_err_view=False))
    Simulator(timing, exp, ctl).run(visualize=False)
    return pd.read_csv(root / "bboxes.csv")


def _run_ours(tmp_path, worm_csv, controller_name, **ctl_kwargs) -> pd.DataFrame:
    from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
    from wtracker_tpu.sim.controllers import (
        CsvController,
        LogConfig,
        LoggingController,
        OptimalController,
        PolyfitConfig,
        PolyfitController,
    )
    from wtracker_tpu.sim.simulator import Simulator

    exp = ExperimentConfig(**EXP_KWARGS)
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)

    if controller_name == "csv":
        inner = CsvController(timing, worm_csv)
    elif controller_name == "optimal":
        inner = OptimalController(timing, worm_csv)
    elif controller_name == "polyfit":
        cfg = PolyfitConfig(**ctl_kwargs)
        inner = PolyfitController(timing, cfg, worm_csv)

    root = tmp_path / "ours"
    ctl = LoggingController(inner, LogConfig(root_folder=str(root), save_err_view=False))
    Simulator(timing, exp, ctl).run(visualize=False, progress=False)
    return pd.read_csv(root / "bboxes.csv")


def _compare(ref: pd.DataFrame, ours: pd.DataFrame, atol: float = 0.0):
    assert list(ref.columns) == list(ours.columns)
    assert len(ref) == len(ours)
    for col in ref.columns:
        if not pd.api.types.is_numeric_dtype(ref[col]):
            assert (ref[col] == ours[col]).all(), f"column {col} differs"
        else:
            np.testing.assert_allclose(
                ours[col].to_numpy(), ref[col].to_numpy(), atol=atol, rtol=0, err_msg=f"column {col}"
            )


@pytest.fixture(scope="module")
def worm_csv(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "worm.csv"
    make_worm_csv(str(path))
    return str(path)


def test_timing_config_parity():
    _, ref_timing = make_reference_configs(EXP_KWARGS, TIMING_KWARGS)

    from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig

    exp = ExperimentConfig(**EXP_KWARGS)
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)

    for attr in (
        "imaging_frame_num",
        "pred_frame_num",
        "moving_frame_num",
        "camera_size_px",
        "micro_size_px",
        "cycle_frame_num",
        "ms_per_frame",
        "mm_per_px",
    ):
        assert getattr(timing, attr) == getattr(ref_timing, attr), attr


def test_csv_controller_log_parity(tmp_path, worm_csv):
    ref = _run_reference(tmp_path, worm_csv, "csv")
    ours = _run_ours(tmp_path, worm_csv, "csv")
    _compare(ref, ours)


def test_optimal_controller_log_parity(tmp_path, worm_csv):
    ref = _run_reference(tmp_path, worm_csv, "optimal")
    ours = _run_ours(tmp_path, worm_csv, "optimal")
    _compare(ref, ours)


def test_polyfit_controller_log_parity(tmp_path, worm_csv):
    kwargs = dict(degree=2, sample_times=[-12, -8, -4, 0, 3], weights=[0.5, 1.0, 1.0, 2.0, 1.5])
    ref = _run_reference(tmp_path, worm_csv, "polyfit", **kwargs)
    ours = _run_ours(tmp_path, worm_csv, "polyfit", **kwargs)
    _compare(ref, ours)


def test_sine_motor_sequence_parity():
    """Integer step sequences of the sine motor match the reference exactly."""
    import_reference()
    from wtracker.sim.motor_controllers import SineMotorController as RefMotor

    from wtracker_tpu.sim.motor import SineMotorController as OurMotor

    _, ref_timing = make_reference_configs(EXP_KWARGS, TIMING_KWARGS)

    from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig

    exp = ExperimentConfig(**EXP_KWARGS)
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)

    rng = np.random.default_rng(3)
    for _ in range(200):
        dx, dy = rng.integers(-150, 150, size=2)
        ref_m, our_m = RefMotor(ref_timing), OurMotor(timing)
        ref_m.register_move(int(dx), int(dy))
        our_m.register_move(int(dx), int(dy))
        ref_steps = [ref_m.step() for _ in range(ref_timing.moving_frame_num)]
        our_steps = [our_m.step() for _ in range(timing.moving_frame_num)]
        assert ref_steps == our_steps, (dx, dy)


def test_integer_motor_steps_closed_form():
    """The jit-safe batched motor matches the sequential host motor."""
    from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
    from wtracker_tpu.sim.motor import SineMotorController, integer_motor_steps, sine_step_weights

    exp = ExperimentConfig(**EXP_KWARGS)
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    n = timing.moving_frame_num
    weights = sine_step_weights(n)

    rng = np.random.default_rng(5)
    ds = rng.integers(-300, 300, size=64)
    batched = np.asarray(integer_motor_steps(weights, ds.astype(float)))  # (n, 64)

    for j, d in enumerate(ds):
        m = SineMotorController(timing)
        m.register_move(int(d), 0)
        seq = [m.step()[0] for _ in range(n)]
        np.testing.assert_array_equal(batched[:, j], seq, err_msg=f"d={d}")

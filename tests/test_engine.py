"""Engine golden tests: the lax.scan engine must reproduce the host simulator's
bboxes.csv bit-for-bit (and the host simulator is itself proven against the
upstream reference in test_sim_parity.py)."""

import numpy as np
import pandas as pd
import pytest

from tests.synthetic import EXP_KWARGS, TIMING_KWARGS, make_worm_csv
from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
from wtracker_tpu.sim.engine import (
    EngineParams,
    csv_controller,
    headless_frame_shape,
    logs_to_frame,
    mlp_controller,
    optimal_controller,
    polyfit_controller,
    run_engine,
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("engine")
    worm_csv = str(tmp / "worm.csv")
    make_worm_csv(worm_csv)

    exp = ExperimentConfig(**EXP_KWARGS)
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    params = EngineParams.from_timing(timing, headless_frame_shape(timing, exp.orig_resolution))
    csv_data = pd.read_csv(worm_csv).to_numpy(dtype=float)
    return tmp, worm_csv, exp, timing, params, csv_data


def _host_log(tmp_path, worm_csv, exp, timing, inner) -> str:
    from wtracker_tpu.sim.controllers import LogConfig, LoggingController
    from wtracker_tpu.sim.simulator import Simulator

    import uuid

    root = tmp_path / f"host-{uuid.uuid4().hex[:8]}"
    ctl = LoggingController(inner, LogConfig(root_folder=str(root), save_err_view=False))
    Simulator(timing, exp, ctl).run(progress=False)
    return str(root / "bboxes.csv")


def _compare(host_csv: str, engine: pd.DataFrame, tmp_path):
    """Byte-level parity: the engine's CSV must equal the host's CSV verbatim
    (modulo line terminators).  Comparing raw text sidesteps pandas' default
    non-round-trip float parser."""
    import uuid

    eng_path = tmp_path / f"eng-{uuid.uuid4().hex[:8]}.csv"
    engine.to_csv(eng_path, index=False)

    host_lines = open(host_csv).read().replace("\r\n", "\n").strip().split("\n")
    eng_lines = open(eng_path).read().strip().split("\n")
    assert len(host_lines) == len(eng_lines)
    for i, (h, e) in enumerate(zip(host_lines, eng_lines)):
        assert h == e, f"line {i}:\n  host: {h}\n  eng : {e}"


def test_engine_csv_parity(setup):
    tmp, worm_csv, exp, timing, params, csv_data = setup
    from wtracker_tpu.sim.controllers import CsvController

    host = _host_log(tmp, worm_csv, exp, timing, CsvController(timing, worm_csv))

    n_cycles = params.n_logged_cycles(exp.num_frames)
    logs = run_engine(params, csv_controller(csv_data, params), exp.init_position, n_cycles)
    engine = logs_to_frame(params, logs)
    _compare(host, engine, tmp)


def test_engine_optimal_parity(setup):
    tmp, worm_csv, exp, timing, params, csv_data = setup
    from wtracker_tpu.sim.controllers import OptimalController

    host = _host_log(tmp, worm_csv, exp, timing, OptimalController(timing, worm_csv))

    n_cycles = params.n_logged_cycles(exp.num_frames)
    logs = run_engine(params, optimal_controller(csv_data, params), exp.init_position, n_cycles)
    engine = logs_to_frame(params, logs)
    _compare(host, engine, tmp)


def test_engine_polyfit_parity(setup):
    tmp, worm_csv, exp, timing, params, csv_data = setup
    from wtracker_tpu.sim.controllers import PolyfitConfig, PolyfitController

    cfg = PolyfitConfig(degree=1, sample_times=[-8, -4, 0, 3], weights=[0.5, 1.0, 2.0, 1.5])
    host = _host_log(tmp, worm_csv, exp, timing, PolyfitController(timing, cfg, worm_csv))

    n_cycles = params.n_logged_cycles(exp.num_frames)
    ctl = polyfit_controller(
        csv_data, params, np.array(cfg.sample_times), np.array(cfg.weights), cfg.degree
    )
    logs = run_engine(params, ctl, exp.init_position, n_cycles)
    engine = logs_to_frame(params, logs)
    _compare(host, engine, tmp)


def test_engine_mlp_parity(setup):
    tmp, worm_csv, exp, timing, params, csv_data = setup
    from wtracker_tpu.models.resmlp import make_rmlp_predictor
    from wtracker_tpu.neural.config import IOConfig
    from wtracker_tpu.sim.controllers import MLPController

    io = IOConfig(input_frames=[0, -3, -6], pred_frames=[3])
    predictor = make_rmlp_predictor(io, block_in_dim=16, block_dims=(8, 16), n_blocks=2, seed=1)

    inner = MLPController(timing, worm_csv, predictor, max_speed=0.9)
    host = _host_log(tmp, worm_csv, exp, timing, inner)

    n_cycles = params.n_logged_cycles(exp.num_frames)
    ctl = mlp_controller(csv_data, params, predictor, inner.max_dist_per_pred)
    logs = run_engine(params, ctl, exp.init_position, n_cycles)
    engine = logs_to_frame(params, logs)
    _compare(host, engine, tmp)


def test_engine_csv_parity_default_timing(tmp_path):
    """Byte parity also holds at the reference's default 200/40/50ms regime
    (15-frame cycles; different camera-ring offsets than the small config)."""
    from tests.synthetic import make_worm_csv
    from wtracker_tpu.sim.controllers import CsvController

    worm_csv = str(tmp_path / "worm.csv")
    make_worm_csv(worm_csv, num_frames=460)

    exp = ExperimentConfig(
        name="d", num_frames=460, frames_per_sec=60, orig_resolution=(500, 600),
        px_per_mm=90, init_position=(300, 250),
    )
    timing = TimingConfig(
        experiment_config=exp, imaging_time_ms=200.0, pred_time_ms=40.0, moving_time_ms=50.0,
        camera_size_mm=(4.0, 4.0), micro_size_mm=(0.32, 0.32),
    )
    assert timing.cycle_frame_num == 15

    params = EngineParams.from_timing(timing, headless_frame_shape(timing, exp.orig_resolution))
    csv_data = pd.read_csv(worm_csv).to_numpy(dtype=float)

    host = _host_log(tmp_path, worm_csv, exp, timing, CsvController(timing, worm_csv))
    logs = run_engine(params, csv_controller(csv_data, params), exp.init_position,
                      params.n_logged_cycles(exp.num_frames))
    _compare(host, logs_to_frame(params, logs), tmp_path)


def test_engine_step_motor_parity(tmp_path):
    """Engine with the step-motor profile matches the host simulator."""
    from tests.synthetic import EXP_KWARGS, TIMING_KWARGS, make_worm_csv
    from wtracker_tpu.sim.controllers import CsvController
    from wtracker_tpu.sim.motor import StepMotorController

    worm_csv = str(tmp_path / "worm.csv")
    make_worm_csv(worm_csv)

    exp = ExperimentConfig(**EXP_KWARGS)
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    params = EngineParams.from_timing(
        timing, headless_frame_shape(timing, exp.orig_resolution), motor="step"
    )
    csv_data = pd.read_csv(worm_csv).to_numpy(dtype=float)

    from wtracker_tpu.sim.controllers import LogConfig, LoggingController
    from wtracker_tpu.sim.simulator import Simulator

    root = tmp_path / "host-step"
    ctl = LoggingController(
        CsvController(timing, worm_csv), LogConfig(root_folder=str(root), save_err_view=False)
    )
    Simulator(timing, exp, ctl, motor_controller=StepMotorController(timing)).run(progress=False)

    logs = run_engine(params, csv_controller(csv_data, params), exp.init_position,
                      params.n_logged_cycles(exp.num_frames))
    _compare(str(root / "bboxes.csv"), logs_to_frame(params, logs), tmp_path)

def test_runner_cache_reuse_across_instances(setup):
    """Two controller instances from the same factory (different data) must
    share one compiled runner — factories set cache_key so fresh closures do
    not force a retrace (VERDICT round-1 item 6)."""
    tmp, worm_csv, exp, timing, params, csv_data = setup
    from wtracker_tpu.sim.engine import _RUNNER_CACHE, _single_runner

    other = csv_data.copy() + 1.0
    c1 = csv_controller(csv_data, params)
    c2 = csv_controller(other, params)
    assert _single_runner(params, c1) is _single_runner(params, c2)

    # a sweep rebuilding controllers per experiment must not grow the cache
    before = len(_RUNNER_CACHE)
    for shift in range(5):
        ctl = csv_controller(csv_data + shift, params)
        run_engine(params, ctl, exp.init_position, 2)
    assert len(_RUNNER_CACHE) == before

    # different static config (polyfit degree) still gets its own entry
    p1 = polyfit_controller(csv_data, params, np.array([-3, -2, -1, 0]), np.ones(4), degree=1)
    p2 = polyfit_controller(csv_data, params, np.array([-3, -2, -1, 0]), np.ones(4), degree=2)
    assert _single_runner(params, p1) is not _single_runner(params, p2)
    # ...while equal-config polyfit controllers with different weights share
    p3 = polyfit_controller(csv_data, params, np.array([-4, -2, 0]), 2 * np.ones(3), degree=1)
    assert _single_runner(params, p1) is _single_runner(params, p3)

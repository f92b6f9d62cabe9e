"""Engine checkpoint/resume: split runs must equal one continuous run."""

import numpy as np
import pandas as pd

from tests.synthetic import EXP_KWARGS, TIMING_KWARGS, make_worm_csv
from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
from wtracker_tpu.sim.engine import EngineParams, csv_controller, headless_frame_shape, run_engine


def test_resume_matches_continuous(tmp_path):
    worm_csv = str(tmp_path / "worm.csv")
    make_worm_csv(worm_csv)

    exp = ExperimentConfig(**EXP_KWARGS)
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    params = EngineParams.from_timing(timing, headless_frame_shape(timing, exp.orig_resolution))
    csv_data = pd.read_csv(worm_csv).to_numpy(dtype=float)
    ctl = csv_controller(csv_data, params)

    full = run_engine(params, ctl, exp.init_position, 30)

    first, carry = run_engine(params, ctl, exp.init_position, 12, return_carry=True)
    # simulate persistence: round-trip the carry through host numpy
    carry = tuple(np.asarray(c) if not isinstance(c, tuple) else c for c in carry)
    second = run_engine(params, ctl, exp.init_position, 18, start_cycle=12, carry=carry)

    np.testing.assert_array_equal(
        np.concatenate([np.asarray(first.positions), np.asarray(second.positions)]),
        np.asarray(full.positions),
    )
    np.testing.assert_allclose(
        np.concatenate([np.asarray(first.worm_bboxes), np.asarray(second.worm_bboxes)]),
        np.asarray(full.worm_bboxes),
        equal_nan=True,
    )

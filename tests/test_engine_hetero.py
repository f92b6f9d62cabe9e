"""Mixed-geometry sweep: streams with different arenas/camera sizes in ONE
compiled run must each reproduce their independent single-stream log exactly
(VERDICT round-1 item 4; reference analogue: experiments/exp{0..4} differ in
resolution 1400-1600 px and px_per_mm 88-92)."""

import numpy as np
import pandas as pd
import pytest

from tests.synthetic import make_worm_csv
from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
from wtracker_tpu.sim.engine import (
    EngineParams,
    csv_controller,
    headless_frame_shape,
    logs_to_frame,
    run_engine,
)
from wtracker_tpu.sim.engine_hetero import (
    csv_controller_hetero,
    geometry_from_configs,
    pad_worm_tables,
    run_sweep_hetero,
)

# two exp0/exp2-style experiments: same timing, different px_per_mm (=> cam px
# size), resolution, init position, and length
EXPS = [
    dict(name="hx0", num_frames=700, frames_per_sec=60, orig_resolution=(500, 520), px_per_mm=90, init_position=(250, 250)),
    dict(name="hx1", num_frames=600, frames_per_sec=60, orig_resolution=(460, 560), px_per_mm=92, init_position=(120, 300)),
]
TIMING = dict(
    imaging_time_ms=200.0,
    pred_time_ms=40.0,
    moving_time_ms=50.0,
    camera_size_mm=(1.2, 1.1),
    micro_size_mm=(0.25, 0.25),
)


@pytest.fixture(scope="module")
def tracks(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("hetero")
    paths = []
    for i, e in enumerate(EXPS):
        p = str(tmp / f"worm{i}.csv")
        make_worm_csv(p, num_frames=e["num_frames"], seed=11 + i)
        paths.append(p)
    return [pd.read_csv(p)[["wrm_x", "wrm_y", "wrm_w", "wrm_h"]].to_numpy(float) for p in paths]


def test_hetero_sweep_matches_single_runs(tracks):
    exps = [ExperimentConfig(**e) for e in EXPS]
    timings = [TimingConfig(experiment_config=e, **TIMING) for e in exps]

    params, geometry = geometry_from_configs(timings, exps)
    assert not np.array_equal(geometry.cam_size[0], geometry.cam_size[1])  # genuinely mixed
    assert not np.array_equal(geometry.bounds[0], geometry.bounds[1])

    ctl = csv_controller_hetero(pad_worm_tables(tracks), params, geometry)
    init = np.asarray([e.init_position for e in exps])
    swept = run_sweep_hetero(params, geometry, ctl, init)

    for i, (exp, timing, table) in enumerate(zip(exps, timings, tracks)):
        own_params = EngineParams.from_timing(timing, headless_frame_shape(timing, exp.orig_resolution))
        n_cycles = own_params.n_logged_cycles(exp.num_frames)
        logs = run_engine(own_params, csv_controller(table, own_params), exp.init_position, n_cycles)
        single = logs_to_frame(own_params, logs)

        assert len(swept[i]) == len(single), f"exp{i} row count"
        # bit-level equality via the CSV text both sides would write
        assert swept[i].to_csv(index=False) == single.to_csv(index=False), f"exp{i} log differs"


def test_hetero_rejects_mismatched_timing(tracks):
    exps = [ExperimentConfig(**e) for e in EXPS]
    t0 = TimingConfig(experiment_config=exps[0], **TIMING)
    t1 = TimingConfig(experiment_config=exps[1], **{**TIMING, "imaging_time_ms": 400.0})
    with pytest.raises(ValueError, match="cycle shape"):
        geometry_from_configs([t0, t1], exps)


def test_hetero_sweep_on_mesh(tracks):
    """The mixed-geometry sweep shards across the CPU mesh and still produces
    the same per-experiment logs as the unsharded run."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")

    from wtracker_tpu.parallel import make_mesh, pad_streams

    exps = [ExperimentConfig(**e) for e in EXPS]
    timings = [TimingConfig(experiment_config=e, **TIMING) for e in exps]
    params, geometry = geometry_from_configs(timings, exps)

    init = np.asarray([e.init_position for e in exps])
    plain = run_sweep_hetero(params, geometry, csv_controller_hetero(pad_worm_tables(tracks), params, geometry), init)

    mesh = make_mesh(2)
    ctl = csv_controller_hetero(pad_worm_tables(tracks), params, geometry)
    meshed = run_sweep_hetero(params, geometry, ctl, init, mesh=mesh)

    for i in range(len(exps)):
        assert meshed[i].to_csv(index=False) == plain[i].to_csv(index=False), f"exp{i}"

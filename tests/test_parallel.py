"""Multi-chip tests on the simulated 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from tests.synthetic import EXP_KWARGS, TIMING_KWARGS


@pytest.fixture(scope="module")
def setup():
    from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
    from wtracker_tpu.sim.engine import EngineParams, headless_frame_shape

    exp = ExperimentConfig(**EXP_KWARGS)
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    params = EngineParams.from_timing(timing, headless_frame_shape(timing, exp.orig_resolution))
    return exp, timing, params


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8  # conftest forces the CPU mesh


def test_sharded_engine_matches_unsharded(setup):
    """Engine results are identical whether streams run on 1 or 8 devices."""
    import pandas as pd

    from wtracker_tpu.parallel import make_mesh, run_engine_sharded
    from wtracker_tpu.sim.engine import csv_controller, run_engine_streams

    exp, timing, params = setup
    S = 8
    rng = np.random.default_rng(0)

    n = 480
    pos = np.cumsum(rng.normal(0.2, 1.0, (S, n, 2)), axis=1) + 250
    csvs = np.concatenate(
        [pos - 5, np.full((S, n, 2), 10.0)], axis=-1
    )  # (S, n, 4) xywh

    # per-stream controller: state carries each stream's csv
    import jax.numpy as jnp

    from wtracker_tpu.sim.engine import CycleController, DecideCtx, _gather_rows

    base = csv_controller(csvs[0], params)

    def init():
        return {"csv": jnp.asarray(csvs, dtype=jnp.float64)}

    def decide(consts, state, ctx):
        # same math as csv_controller but reading from carried state
        f = ctx.cycle * params.cycle_n + params.imaging_n
        bbox = _gather_rows(state["csv"], f - params.pred_n)
        cam_tl = jnp.stack(
            [ctx.position[0] - params.cam_w // 2, ctx.position[1] - params.cam_h // 2]
        )
        rel_xy = bbox[:2] - cam_tl
        center = rel_xy + bbox[2:] / 2
        target = center - jnp.array([params.cam_w / 2, params.cam_h / 2])
        valid = jnp.isfinite(bbox).all()
        return state, jnp.where(valid, jnp.round(target), 0.0).astype(jnp.int32)

    def predict_all(consts, state, cycle_idx, positions):
        idx = cycle_idx * params.cycle_n + jnp.arange(params.cycle_n)
        return _gather_rows(state["csv"], idx)

    ctl = CycleController(init=init, decide=decide, predict_all=predict_all)

    init_pos = np.tile(np.asarray(exp.init_position), (S, 1))
    n_cycles = 20

    plain = run_engine_streams(params, ctl, init_pos, n_cycles)

    mesh = make_mesh(8)
    sharded = run_engine_sharded(params, ctl, init_pos, n_cycles, mesh)

    np.testing.assert_array_equal(np.asarray(sharded.positions), np.asarray(plain.positions))
    np.testing.assert_allclose(
        np.asarray(sharded.worm_bboxes), np.asarray(plain.worm_bboxes), equal_nan=True
    )

    # verify the data is actually distributed
    shards = sharded.positions.addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape[1] == 1  # S=8 split 8 ways


def test_dp_train_step(setup):
    import jax.numpy as jnp
    import optax

    from wtracker_tpu.models.resmlp import make_rmlp_predictor
    from wtracker_tpu.neural.config import IOConfig
    from wtracker_tpu.parallel import make_dp_train_step, make_mesh

    io = IOConfig(input_frames=[0, -2], pred_frames=[2])
    predictor = make_rmlp_predictor(io, block_in_dim=8, block_dims=(8,), n_blocks=1, batch_norm=False, seed=0)

    mesh = make_mesh(8, axis="data")
    tx = optax.adam(1e-3)
    loss_fn = lambda p, y: ((p - y) ** 2).mean()
    step = make_dp_train_step(predictor.model, tx, loss_fn, mesh)

    params = predictor.variables["params"]
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    X = rng.normal(size=(64, io.in_dim)).astype(np.float32)
    y = rng.normal(size=(64, io.out_dim)).astype(np.float32)

    with mesh:
        losses = []
        for _ in range(30):
            params, opt_state, l = step(params, opt_state, X, y)
            losses.append(float(l))
    assert losses[-1] < losses[0]


def test_csv_controller_streams_matches_per_stream(setup):
    """The official stream playback controller equals S single-stream runs."""
    import jax.numpy as jnp

    from wtracker_tpu.sim.engine import csv_controller, csv_controller_streams, run_engine, run_engine_streams

    exp, timing, params = setup
    S, n = 4, 480
    rng = np.random.default_rng(7)
    pos = np.cumsum(rng.normal(0.2, 1.0, (S, n, 2)), axis=1) + 250
    csvs = np.concatenate([pos - 5, np.full((S, n, 2), 10.0)], axis=-1)
    csvs[:, ::41] = np.nan

    init_pos = np.tile(np.asarray(exp.init_position), (S, 1))
    batch = run_engine_streams(
        params, csv_controller_streams(csvs, params), init_pos, 20, batched_controller=True
    )

    for i in range(S):
        single = run_engine(params, csv_controller(csvs[i], params), exp.init_position, 20)
        np.testing.assert_array_equal(np.asarray(batch.positions[:, i]), np.asarray(single.positions))
        np.testing.assert_allclose(
            np.asarray(batch.worm_bboxes[:, i]), np.asarray(single.worm_bboxes), equal_nan=True
        )


def test_sharded_rejects_uneven_streams():
    """S not divisible by the mesh must fail loudly with padding guidance
    (VERDICT round-1 item 9 — documented contract, not silent misbehavior)."""
    import numpy as np
    import pytest

    from tests.synthetic import EXP_KWARGS, TIMING_KWARGS
    from wtracker_tpu.parallel import make_mesh, run_engine_sharded
    from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
    from wtracker_tpu.sim.engine import EngineParams, csv_controller, headless_frame_shape

    exp = ExperimentConfig(**EXP_KWARGS)
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    params = EngineParams.from_timing(timing, headless_frame_shape(timing, exp.orig_resolution))

    mesh = make_mesh()  # 8 virtual CPU devices (conftest)
    table = np.zeros((60, 4))
    ctl = csv_controller(table, params)
    init = np.tile(exp.init_position, (mesh.devices.size + 1, 1))  # 9 streams on 8 devices
    with pytest.raises(ValueError, match="not a multiple of the mesh size"):
        run_engine_sharded(params, ctl, init, 2, mesh)


def test_pad_streams_then_shard():
    """pad_streams makes an uneven batch mesh-divisible; the pad slots replay
    the last real stream, so their logs are identical and discardable."""
    import jax.numpy as jnp
    import numpy as np

    from tests.synthetic import EXP_KWARGS, TIMING_KWARGS
    from wtracker_tpu.parallel import make_mesh, pad_streams, run_engine_sharded
    from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
    from wtracker_tpu.sim.engine import (
        CycleController,
        EngineParams,
        _gather_rows,
        headless_frame_shape,
    )

    exp = ExperimentConfig(**EXP_KWARGS)
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    params = EngineParams.from_timing(timing, headless_frame_shape(timing, exp.orig_resolution))
    mesh = make_mesh()

    rng = np.random.default_rng(0)
    s_real = mesh.devices.size + 3  # 11 streams on 8 devices
    tables = rng.uniform(50, 400, size=(s_real, 90, 4))
    init = np.tile(exp.init_position, (s_real, 1))

    padded_tables, padded_init, real = pad_streams(tables, init, mesh.devices.size)
    assert real == s_real and padded_tables.shape[0] % mesh.devices.size == 0

    # per-stream playback controller: state carries each stream's own table
    def init_state():
        return {"csv": jnp.asarray(padded_tables, dtype=jnp.float64)}

    def decide(consts, state, ctx):
        f = ctx.cycle * params.cycle_n + params.imaging_n
        bbox = _gather_rows(state["csv"], f - params.pred_n)
        cam_tl = jnp.stack([ctx.position[0] - params.cam_w // 2, ctx.position[1] - params.cam_h // 2])
        center = (bbox[:2] - cam_tl) + bbox[2:] / 2
        target = center - jnp.array([params.cam_w / 2, params.cam_h / 2])
        ok = jnp.isfinite(bbox).all()
        return state, jnp.where(ok, jnp.round(target), 0.0).astype(jnp.int32)

    def predict_all(consts, state, cycle_idx, positions):
        return _gather_rows(state["csv"], cycle_idx * params.cycle_n + jnp.arange(params.cycle_n))

    ctl = CycleController(init=init_state, decide=decide, predict_all=predict_all)
    logs = run_engine_sharded(params, ctl, padded_init, 3, mesh)

    assert np.asarray(logs.positions).shape[1] == padded_tables.shape[0]
    np.testing.assert_array_equal(
        np.asarray(logs.positions)[:, real - 1], np.asarray(logs.positions)[:, -1]
    )

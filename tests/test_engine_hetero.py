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


# -- live YOLO+MLP across mixed geometries (VERDICT round-2 item 3) -----------


def _tiny_live_models():
    import jax
    import jax.numpy as jnp

    from wtracker_tpu.models.resmlp import make_rmlp_predictor
    from wtracker_tpu.models.yolov8 import YoloV8
    from wtracker_tpu.neural.config import IOConfig

    model = YoloV8(nc=1, scale="n")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    io = IOConfig(input_frames=[0, -2, -4], pred_frames=[3])
    predictor = make_rmlp_predictor(io, block_in_dim=8, block_dims=(8,), n_blocks=1, seed=0)
    return model, variables, predictor


def test_live_hetero_matches_per_group_runs(tracks):
    """The mixed live run must reproduce what each geometry group produces
    when run on its own (canvas pinned so compiled shapes match)."""
    from wtracker_tpu.sim.engine import run_engine_streams
    from wtracker_tpu.sim.engine_hetero import StreamGeometry, yolo_mlp_controller_hetero
    from wtracker_tpu.sim.engine_live import LiveLoopConfig
    from wtracker_tpu.sim.synthetic import SyntheticScene, make_trajectory

    exps = [ExperimentConfig(**e) for e in EXPS]
    timings = [TimingConfig(experiment_config=e, **TIMING) for e in exps]
    params, geometry2 = geometry_from_configs(timings, exps)

    # 4 streams: two per geometry
    sel = [0, 0, 1, 1]
    geometry = StreamGeometry(
        cam_size=geometry2.cam_size[sel],
        mic_size=geometry2.mic_size[sel],
        bounds=geometry2.bounds[sel],
        num_frames=geometry2.num_frames[sel],
    )
    assert not np.array_equal(geometry.cam_size[0], geometry.cam_size[2])

    scene = SyntheticScene()
    model, variables, predictor = _tiny_live_models()
    trajs = np.stack(
        [make_trajectory(300, tuple(geometry.bounds[i][::-1]), seed=10 + i) for i in range(4)]
    )
    cfg = LiveLoopConfig(imgsz=(64, 64), conf=0.0, ring_size=32, log_mode=True, max_dist_per_pred=20.0)
    init = np.stack([np.asarray(exps[g].init_position) for g in sel])
    canvas = (int(geometry.cam_size[:, 1].max()), int(geometry.cam_size[:, 0].max()))

    ctl = yolo_mlp_controller_hetero(
        params, geometry, cfg, scene, trajs, model, variables, predictor, canvas_hw=canvas
    )
    mixed = run_engine_streams(params, ctl, init, 4, batched_controller=True)

    for grp, rows in ((0, [0, 1]), (1, [2, 3])):
        sub = StreamGeometry(
            cam_size=geometry.cam_size[rows],
            mic_size=geometry.mic_size[rows],
            bounds=geometry.bounds[rows],
            num_frames=geometry.num_frames[rows],
        )
        ctl_g = yolo_mlp_controller_hetero(
            params, sub, cfg, scene, trajs[rows], model, variables, predictor, canvas_hw=canvas
        )
        single = run_engine_streams(params, ctl_g, init[rows], 4, batched_controller=True)

        # batch size differs between the runs (4 vs 2 streams), which can move
        # conv numerics a last ulp and flip an argmax tie on rare views — the
        # same tolerance the chunked-detect equivalence test documents
        p_m = np.asarray(mixed.positions[:, rows]).reshape(-1, 2)
        p_s = np.asarray(single.positions).reshape(-1, 2)
        pos_same = np.all(np.abs(p_m - p_s) <= 2, axis=1)
        assert pos_same.mean() >= 0.995, f"group {grp}: {pos_same.mean():.3f} positions match"

        b_m = np.asarray(mixed.worm_bboxes[:, rows]).reshape(-1, 4)
        b_s = np.asarray(single.worm_bboxes).reshape(-1, 4)
        row_close = np.all(np.isclose(b_m, b_s, atol=1e-3, equal_nan=True), axis=1)
        assert row_close.mean() >= 0.995, f"group {grp}: {row_close.mean():.3f} boxes match"


def test_live_hetero_letterbox_matches_homogeneous_path(tracks):
    """For a single-geometry stream set whose camera equals the canvas, the
    hetero controller must agree with the homogeneous flat controller (the
    per-stream letterbox operators reduce to the shared-matrix letterbox)."""
    import jax.numpy as jnp

    from wtracker_tpu.sim.engine import run_engine_streams
    from wtracker_tpu.sim.engine_hetero import StreamGeometry, yolo_mlp_controller_hetero
    from wtracker_tpu.sim.engine_live import LiveLoopConfig, make_stream_batch_flat
    from wtracker_tpu.sim.synthetic import SyntheticScene, make_trajectory

    exps = [ExperimentConfig(**EXPS[0])] * 2
    timings = [TimingConfig(experiment_config=e, **TIMING) for e in exps]
    params, geometry = geometry_from_configs(timings, exps)

    scene = SyntheticScene()
    model, variables, predictor = _tiny_live_models()
    trajs = np.stack(
        [make_trajectory(300, tuple(geometry.bounds[i][::-1]), seed=20 + i) for i in range(2)]
    )
    cfg = LiveLoopConfig(imgsz=(64, 64), conf=0.0, ring_size=32, log_mode=True, max_dist_per_pred=20.0)
    init = np.stack([np.asarray(e.init_position) for e in exps])

    ctl_h = yolo_mlp_controller_hetero(params, geometry, cfg, scene, trajs, model, variables, predictor)
    hetero = run_engine_streams(params, ctl_h, init, 3, batched_controller=True)

    ctl_f = make_stream_batch_flat(params, cfg, scene, trajs, model, variables, predictor)
    flat = run_engine_streams(params, ctl_f, init, 3, batched_controller=True)

    p_h = np.asarray(hetero.positions).reshape(-1, 2)
    p_f = np.asarray(flat.positions).reshape(-1, 2)
    pos_same = np.all(np.abs(p_h - p_f) <= 2, axis=1)
    assert pos_same.mean() >= 0.995, f"{pos_same.mean():.3f} positions match"
    b_h = np.asarray(hetero.worm_bboxes).reshape(-1, 4)
    b_f = np.asarray(flat.worm_bboxes).reshape(-1, 4)
    row_close = np.all(np.isclose(b_h, b_f, atol=1e-3, equal_nan=True), axis=1)
    assert row_close.mean() >= 0.995, f"{row_close.mean():.3f} boxes match"


def test_live_hetero_int8_forward(tracks):
    """The int8 serving path drives the mixed-geometry live loop through the
    forward_fn hook (decode/unletterbox shared with the bf16 path)."""
    import jax.numpy as jnp

    from wtracker_tpu.models.yolov8 import YoloV8, fuse_conv_bn
    from wtracker_tpu.models.yolov8_int8 import quantize_detector
    from wtracker_tpu.sim.engine import run_engine_streams
    from wtracker_tpu.sim.engine_hetero import StreamGeometry, yolo_mlp_controller_hetero
    from wtracker_tpu.sim.engine_live import LiveLoopConfig
    from wtracker_tpu.sim.synthetic import SyntheticScene, make_trajectory

    exps = [ExperimentConfig(**e) for e in EXPS]
    timings = [TimingConfig(experiment_config=e, **TIMING) for e in exps]
    params, geometry = geometry_from_configs(timings, exps)

    scene = SyntheticScene()
    model, variables, predictor = _tiny_live_models()
    fused_model = YoloV8(nc=1, scale="n", fused=True)
    fused_vars = fuse_conv_bn(variables)

    trajs = np.stack(
        [make_trajectory(300, tuple(geometry.bounds[i][::-1]), seed=30 + i) for i in range(len(exps))]
    )
    xy = jnp.asarray(trajs[0, :8], jnp.float32)
    w0, h0 = int(geometry.cam_size[0, 0]), int(geometry.cam_size[0, 1])
    bw, bh = int(geometry.bounds[0, 0]), int(geometry.bounds[0, 1])
    tls = jnp.clip(xy - jnp.array([w0 // 2, h0 // 2]), 0, jnp.array([bw - w0, bh - h0]))
    calib = np.asarray(scene.render_views(xy, tls.astype(jnp.float32), (h0, w0), jnp.arange(8)))
    q = quantize_detector(fused_model, fused_vars, calib, (64, 64))

    cfg = LiveLoopConfig(imgsz=(64, 64), conf=0.0, ring_size=32, log_mode=True, max_dist_per_pred=20.0)
    init = np.stack([np.asarray(e.init_position) for e in exps])
    ctl = yolo_mlp_controller_hetero(
        params, geometry, cfg, scene, trajs, fused_model, q.device_weights(), predictor,
        forward_fn=q.apply,
    )
    logs = run_engine_streams(params, ctl, init, 3, batched_controller=True)

    pos = np.asarray(logs.positions)
    assert pos.shape == (3, len(exps), params.cycle_n, 2) and np.isfinite(pos).all()
    assert np.isfinite(np.asarray(logs.worm_bboxes)[1:]).any()  # detections flow


def test_bucket_by_cycle_shape():
    from wtracker_tpu.sim.engine_hetero import bucket_by_cycle_shape

    e = ExperimentConfig(**EXPS[0])
    t_a = TimingConfig(experiment_config=e, **TIMING)
    t_b = TimingConfig(experiment_config=e, **{**TIMING, "imaging_time_ms": 400.0})
    assert bucket_by_cycle_shape([t_a, t_b, t_a]) == [[0, 2], [1]]
    assert bucket_by_cycle_shape([t_a]) == [[0]]

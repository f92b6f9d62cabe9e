"""Live-loop tests: synthetic renderer, hybrid YOLO+MLP engine controller."""

import numpy as np
import pytest

import jax.numpy as jnp

from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
from wtracker_tpu.sim.engine import EngineParams, headless_frame_shape, logs_to_frame, run_engine, run_engine_streams
from wtracker_tpu.sim.engine_live import LiveLoopConfig, hybrid_yolo_mlp_controller, make_stream_batch
from wtracker_tpu.sim.synthetic import SyntheticScene, make_trajectory

from tests.synthetic import EXP_KWARGS, TIMING_KWARGS


@pytest.fixture(scope="module")
def setup():
    exp = ExperimentConfig(**EXP_KWARGS)
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    params = EngineParams.from_timing(timing, headless_frame_shape(timing, exp.orig_resolution))
    return exp, timing, params


def test_renderer_basic():
    scene = SyntheticScene()
    view = np.asarray(scene.render_view(jnp.array([50.0, 40.0]), jnp.array([20.0, 10.0]), (64, 80), 0))
    assert view.shape == (64, 80)
    assert view.min() >= 0 and view.max() <= 255
    # worm blob is the brightest spot and sits at (50-20, 40-10) in view coords
    peak = np.unravel_index(np.argmax(view), view.shape)
    assert abs(peak[0] - 30) <= 1 and abs(peak[1] - 30) <= 1

    # batched rendering matches single
    views = np.asarray(
        scene.render_views(
            jnp.array([[50.0, 40.0]]), jnp.array([[20.0, 10.0]]), (64, 80), jnp.array([0])
        )
    )
    np.testing.assert_allclose(views[0], view)


def test_trajectory_in_bounds():
    traj = make_trajectory(2000, (500, 600), seed=1)
    assert traj.shape == (2000, 2)
    assert (traj[:, 0] >= 0).all() and (traj[:, 0] < 600).all()
    assert (traj[:, 1] >= 0).all() and (traj[:, 1] < 500).all()
    # it actually moves
    assert np.hypot(*(traj[-1] - traj[0])) + np.abs(np.diff(traj, axis=0)).sum() > 100


def _tiny_predictor():
    from wtracker_tpu.models.resmlp import make_rmlp_predictor
    from wtracker_tpu.neural.config import IOConfig

    io = IOConfig(input_frames=[0, -2, -4], pred_frames=[3])
    return make_rmlp_predictor(io, block_in_dim=8, block_dims=(8,), n_blocks=1, seed=0)


def _tiny_detector():
    from wtracker_tpu.models.yolov8 import YoloV8

    import jax

    model = YoloV8(nc=1, scale="n")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    return model, variables


def test_live_loop_runs_and_logs(setup):
    exp, timing, params = setup
    scene = SyntheticScene()
    traj = make_trajectory(400, (500, 600), seed=0)
    model, variables = _tiny_detector()
    predictor = _tiny_predictor()

    cfg = LiveLoopConfig(imgsz=(64, 64), conf=0.0, ring_size=32, log_mode=True, max_dist_per_pred=20.0)
    ctl = hybrid_yolo_mlp_controller(params, cfg, scene, traj, model, variables, predictor)

    n_cycles = 8
    logs = run_engine(params, ctl, exp.init_position, n_cycles)
    df = logs_to_frame(params, logs)
    assert len(df) == n_cycles * params.cycle_n
    # with conf=0 every frame gets a (possibly wrong) detection -> no zero rows
    assert np.isfinite(df[["wrm_x", "wrm_y", "wrm_w", "wrm_h"]].to_numpy()).all()
    # positions stay inside the clamp bounds
    assert df.plt_x.between(0, params.frame_w - 1).all()
    assert df.plt_y.between(0, params.frame_h - 1).all()


def test_live_loop_stream_batch(setup):
    exp, timing, params = setup
    scene = SyntheticScene()
    S = 3
    trajs = np.stack([make_trajectory(400, (500, 600), seed=i) for i in range(S)])
    model, variables = _tiny_detector()
    predictor = _tiny_predictor()

    cfg = LiveLoopConfig(imgsz=(64, 64), conf=0.0, ring_size=32, log_mode=False, max_dist_per_pred=20.0)
    ctl = make_stream_batch(params, cfg, scene, trajs, model, variables, predictor)

    init_pos = np.tile(np.asarray(exp.init_position), (S, 1))
    logs = run_engine_streams(params, ctl, init_pos, n_cycles=5)
    assert logs.positions.shape == (5, S, params.cycle_n, 2)
    assert logs.worm_bboxes.shape == (5, S, params.cycle_n, 4)

    # stream 0 of the batch equals the single-stream run (same trajectory)
    single = run_engine(
        params,
        hybrid_yolo_mlp_controller(params, cfg, scene, trajs[0], model, variables, predictor),
        exp.init_position,
        5,
    )
    np.testing.assert_array_equal(np.asarray(logs.positions[:, 0]), np.asarray(single.positions))
    np.testing.assert_allclose(
        np.asarray(logs.worm_bboxes[:, 0]), np.asarray(single.worm_bboxes), atol=1e-5, equal_nan=True
    )


def test_flat_stream_batch_matches_vmap(setup):
    """Batched-controller mode produces the same logs as vmap-of-streams."""
    from wtracker_tpu.sim.engine_live import make_stream_batch_flat

    exp, timing, params = setup
    scene = SyntheticScene()
    S = 3
    trajs = np.stack([make_trajectory(400, (500, 600), seed=i) for i in range(S)])
    model, variables = _tiny_detector()
    predictor = _tiny_predictor()

    cfg = LiveLoopConfig(imgsz=(64, 64), conf=0.0, ring_size=32, log_mode=True, max_dist_per_pred=20.0)
    ctl_v = make_stream_batch(params, cfg, scene, trajs, model, variables, predictor)
    ctl_f = make_stream_batch_flat(params, cfg, scene, trajs, model, variables, predictor)

    init_pos = np.tile(np.asarray(exp.init_position), (S, 1))
    logs_v = run_engine_streams(params, ctl_v, init_pos, 5)
    logs_f = run_engine_streams(params, ctl_f, init_pos, 5, batched_controller=True)

    np.testing.assert_array_equal(np.asarray(logs_f.positions), np.asarray(logs_v.positions))
    np.testing.assert_allclose(
        np.asarray(logs_f.worm_bboxes), np.asarray(logs_v.worm_bboxes), atol=2e-4, equal_nan=True
    )


def test_fused_single_batch_matches_flat(setup):
    """The fused (delayed-log) controller emits the same logs as the flat one."""
    from wtracker_tpu.sim.engine_live import make_stream_batch_flat, make_stream_batch_fused

    exp, timing, params = setup
    scene = SyntheticScene()
    S = 3
    trajs = np.stack([make_trajectory(400, (500, 600), seed=i) for i in range(S)])
    model, variables = _tiny_detector()
    predictor = _tiny_predictor()

    cfg = LiveLoopConfig(imgsz=(64, 64), conf=0.0, ring_size=32, log_mode=True, max_dist_per_pred=20.0)
    ctl_flat = make_stream_batch_flat(params, cfg, scene, trajs, model, variables, predictor)
    ctl_fused = make_stream_batch_fused(params, cfg, scene, trajs, model, variables, predictor)

    init_pos = np.tile(np.asarray(exp.init_position), (S, 1))
    n = 6
    logs_flat = run_engine_streams(params, ctl_flat, init_pos, n, batched_controller=True)
    logs_fused = run_engine_streams(params, ctl_fused, init_pos, n, delayed_log=True)

    np.testing.assert_array_equal(np.asarray(logs_fused.positions), np.asarray(logs_flat.positions))
    np.testing.assert_allclose(
        np.asarray(logs_fused.worm_bboxes),
        np.asarray(logs_flat.worm_bboxes),
        atol=2e-4,
        equal_nan=True,
    )


def test_live_loop_no_detection_fallback(setup):
    """conf > 1 → no detections ever → loop must hold position, not NaN out."""
    exp, timing, params = setup
    scene = SyntheticScene()
    traj = make_trajectory(400, (500, 600), seed=0)
    model, variables = _tiny_detector()
    predictor = _tiny_predictor()

    cfg = LiveLoopConfig(imgsz=(64, 64), conf=2.0, ring_size=32, log_mode=True, max_dist_per_pred=20.0)
    ctl = hybrid_yolo_mlp_controller(params, cfg, scene, traj, model, variables, predictor)
    logs = run_engine(params, ctl, exp.init_position, 6)

    pos = np.asarray(logs.positions)
    # platform never moves: every decision falls back to (0, 0)
    assert (pos == pos[0, 0]).all()
    # and the log rows carry NaN (missing detection protocol)
    assert np.isnan(np.asarray(logs.worm_bboxes)).all()


def test_decision_step_matches_reference_math(setup):
    """make_decision_step (the deployment decision bench.py latency-traces)
    must assemble features and emit moves exactly as the engine controllers
    do: detect each input frame, shift boxes to arena coords, run the MLP on
    origin-relative history, clip+round, with the detection-centering and
    stay-put fallbacks. Verified against an independent numpy reimplementation
    of the math (reference: mlp_controllers.py:38-68 + csv_controller
    fallback)."""
    import jax

    from wtracker_tpu.sim.engine_live import make_decision_step
    from wtracker_tpu.models.yolov8 import detect_top1

    exp, timing, params = setup
    scene = SyntheticScene()
    model, variables = _tiny_detector()
    predictor = _tiny_predictor()
    k = len(predictor.io_config.input_frames)
    H, W = 64, 80
    cfg = LiveLoopConfig(imgsz=(64, 64), conf=0.0, ring_size=32, max_dist_per_pred=20.0)

    decide = jax.jit(make_decision_step(cfg, model, variables, predictor, (H, W)))

    S = 2
    rng = np.random.default_rng(0)
    cam_tl = jnp.asarray(rng.uniform(50, 200, (S, 2)).round())
    # worm near each camera's center, drifting a little per history frame
    worm = np.asarray(cam_tl)[:, None] + [W / 2, H / 2] + rng.uniform(-6, 6, (S, k, 2))
    views = jnp.stack(
        [
            scene.render_views(
                jnp.asarray(worm[s]), jnp.tile(cam_tl[s], (k, 1)).astype(jnp.float32),
                (H, W), jnp.arange(k),
            )
            for s in range(S)
        ]
    )  # (S, k, H, W)

    move = np.asarray(decide(variables, predictor.variables, views, cam_tl))
    assert move.shape == (S, 2) and move.dtype == np.int32

    # independent recomputation: detect the same flat batch, then numpy math
    boxes = np.asarray(
        detect_top1(model, variables, views.reshape(S * k, H, W), cfg.imgsz, cfg.conf)
    )
    feats_abs = boxes.reshape(S, k, 4).copy()
    feats_abs[..., :2] += np.repeat(np.asarray(cam_tl), k, axis=0).reshape(S, k, 2)
    assert np.isfinite(feats_abs).all()  # conf=0: every frame detects
    cam_center = np.asarray(cam_tl) + [W / 2, H / 2]
    rel = feats_abs[:, 0, :2] - cam_center
    feats = feats_abs.copy()
    feats[..., :2] -= feats_abs[:, 0:1, :2]
    pred = np.asarray(
        predictor.model.apply(
            predictor.variables, jnp.asarray(feats.reshape(S, -1), jnp.float32), train=False
        )
    )
    expected = np.round(np.clip(pred[:, :2], -20.0, 20.0) + rel).astype(np.int32)
    np.testing.assert_array_equal(move, expected)

    # no detections anywhere (conf > 1) -> stay put, never NaN
    cfg_miss = LiveLoopConfig(imgsz=(64, 64), conf=2.0, ring_size=32, max_dist_per_pred=20.0)
    decide_miss = jax.jit(make_decision_step(cfg_miss, model, variables, predictor, (H, W)))
    move_miss = np.asarray(decide_miss(variables, predictor.variables, views, cam_tl))
    np.testing.assert_array_equal(move_miss, np.zeros((S, 2), np.int32))


def test_chunked_detect_equals_single_batch():
    """detect_chunks splits the per-cycle batch sequentially; per-view math is
    independent, so logs must be identical to the single-batch run."""
    import numpy as np

    from wtracker_tpu.sim.engine import run_engine_streams
    from wtracker_tpu.sim.engine_live import LiveLoopConfig, make_stream_batch_fused
    from wtracker_tpu.sim.synthetic import SyntheticScene, make_trajectory

    exp = ExperimentConfig(**EXP_KWARGS)
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    params = EngineParams.from_timing(timing, headless_frame_shape(timing, exp.orig_resolution))
    model, variables = _tiny_detector()
    predictor = _tiny_predictor()
    S = 4
    trajs = np.stack([make_trajectory(200, (160, 160), seed=i) for i in range(S)])
    base = dict(imgsz=(64, 64), conf=0.0, ring_size=32, log_mode=True, max_dist_per_pred=20.0)
    init = np.tile([80, 80], (S, 1))

    ctl1 = make_stream_batch_fused(params, LiveLoopConfig(**base), SyntheticScene(), trajs, model, variables, predictor)
    ctl4 = make_stream_batch_fused(
        params, LiveLoopConfig(**base, detect_chunks=4), SyntheticScene(), trajs, model, variables, predictor
    )
    logs1 = run_engine_streams(params, ctl1, init, 4, delayed_log=True)
    logs4 = run_engine_streams(params, ctl4, init, 4, delayed_log=True)

    # conv numerics may differ in the last ulp between batch sizes, which can
    # flip an exact argmax tie on rare views; the same detections feed both
    # the log AND the decision path, so positions get the same rare-row
    # allowance as the boxes (a flipped tie shifts the platform a few px)
    p1 = np.asarray(logs1.positions).reshape(-1, 2)
    p4 = np.asarray(logs4.positions).reshape(-1, 2)
    pos_same = np.all(np.abs(p1 - p4) <= 2, axis=1)
    assert pos_same.mean() >= 0.995, f"only {pos_same.mean():.3f} of positions match"
    a = np.asarray(logs1.worm_bboxes).reshape(-1, 4)
    b = np.asarray(logs4.worm_bboxes).reshape(-1, 4)
    row_close = np.all(np.isclose(a, b, atol=1e-4, equal_nan=True), axis=1)
    assert row_close.mean() >= 0.995, f"only {row_close.mean():.3f} of rows match"

    # the python-unrolled chunk loop is the SAME per-chunk computation as the
    # lax.map form (just a different loop construct) at the SAME chunk batch
    # size — but XLA may fuse/schedule the unrolled iterations differently
    # than the shared map body, so bit-identity is not a contract we can pin.
    # Deliberate contract (VERDICT r3 item 8): same rare-row allowance as the
    # k=1 comparison — a real chunk-indexing bug breaks ~all rows, a last-ulp
    # conv difference flips at most an argmax tie on rare views.
    ctl4u = make_stream_batch_fused(
        params,
        LiveLoopConfig(**base, detect_chunks=4, detect_unroll=True),
        SyntheticScene(), trajs, model, variables, predictor,
    )
    logs4u = run_engine_streams(params, ctl4u, init, 4, delayed_log=True)
    pm = np.asarray(logs4.positions).reshape(-1, 2)
    pu = np.asarray(logs4u.positions).reshape(-1, 2)
    upos_same = np.all(np.abs(pm - pu) <= 2, axis=1)
    assert upos_same.mean() >= 0.995, f"only {upos_same.mean():.3f} of positions match"
    bm = np.asarray(logs4.worm_bboxes).reshape(-1, 4)
    bu = np.asarray(logs4u.worm_bboxes).reshape(-1, 4)
    urow_close = np.all(np.isclose(bm, bu, atol=1e-4, equal_nan=True), axis=1)
    assert urow_close.mean() >= 0.995, f"only {urow_close.mean():.3f} of rows match"

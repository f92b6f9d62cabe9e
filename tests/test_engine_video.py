"""Video live-loop tests: chunked frame residency + crop-based detection."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.synthetic import EXP_KWARGS, TIMING_KWARGS
from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
from wtracker_tpu.sim.engine import EngineParams
from wtracker_tpu.sim.engine_live import LiveLoopConfig
from wtracker_tpu.sim.engine_video import run_video_live, video_live_controller
from wtracker_tpu.sim.synthetic import make_trajectory


@pytest.fixture(scope="module")
def video():
    """A synthetic recording: noisy background + bright worm blob."""
    rng = np.random.default_rng(0)
    H, W, F = 300, 360, 400
    traj = make_trajectory(F, (H, W), seed=3, margin=50)
    bg = rng.integers(20, 40, (H, W), dtype=np.uint8)
    frames = np.repeat(bg[None], F, axis=0)
    for i in range(F):
        x, y = int(traj[i, 0]), int(traj[i, 1])
        frames[i, max(y - 4, 0) : y + 4, max(x - 6, 0) : x + 6] = 220
    return frames, traj


def _models():
    from wtracker_tpu.models.resmlp import make_rmlp_predictor
    from wtracker_tpu.models.yolov8 import YoloV8
    from wtracker_tpu.neural.config import IOConfig

    model = YoloV8(nc=1, scale="n")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    predictor = make_rmlp_predictor(
        IOConfig(input_frames=[0, -2, -4], pred_frames=[3]), block_in_dim=8, block_dims=(8,), n_blocks=1
    )
    return model, variables, predictor


def test_video_loop_chunked_runs(video):
    frames, traj = video
    exp = ExperimentConfig("vid", len(frames), 60, frames.shape[1:], 90, (180, 150))
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    # clamp bounds = the actual video frame (no dummy padding in video mode)
    params = EngineParams.from_timing(timing, frames.shape[1:])

    model, variables, predictor = _models()
    cfg = LiveLoopConfig(imgsz=(64, 64), conf=0.0, ring_size=32, log_mode=True, max_dist_per_pred=20.0)

    source = lambda s, n: frames[s : s + n]
    logs = run_video_live(
        params, cfg, source, len(frames), model, variables, predictor, exp.init_position, cycles_per_chunk=16
    )

    n_cycles = params.n_logged_cycles(len(frames))
    assert np.asarray(logs.positions).shape == (n_cycles, params.cycle_n, 2)
    assert np.isfinite(np.asarray(logs.worm_bboxes)).all()  # conf=0 -> always a box

    # chunked result identical to one-chunk run
    logs_one = run_video_live(
        params, cfg, source, len(frames), model, variables, predictor, exp.init_position, cycles_per_chunk=64
    )
    np.testing.assert_array_equal(np.asarray(logs.positions), np.asarray(logs_one.positions))
    np.testing.assert_allclose(
        np.asarray(logs.worm_bboxes), np.asarray(logs_one.worm_bboxes), atol=1e-6, equal_nan=True
    )


def test_video_first_cycle_matches_manual_detection(video):
    frames, traj = video
    exp = ExperimentConfig("vid", len(frames), 60, frames.shape[1:], 90, (180, 150))
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    params = EngineParams.from_timing(timing, frames.shape[1:])

    model, variables, predictor = _models()
    cfg = LiveLoopConfig(imgsz=(64, 64), conf=0.0, ring_size=32, log_mode=True, max_dist_per_pred=20.0)
    source = lambda s, n: frames[s : s + n]
    logs = run_video_live(
        params, cfg, source, len(frames), model, variables, predictor, exp.init_position, cycles_per_chunk=16
    )

    # manual: crop the imaging views of cycle 0 and run the detector directly
    from wtracker_tpu.models.yolov8 import detect_top1

    H, W = frames.shape[1:]
    cam_w, cam_h = params.cam_w, params.cam_h
    pos = np.asarray(logs.positions)[0, 0]  # stationary during imaging
    tlx = int(np.clip(pos[0] - cam_w // 2, 0, W - cam_w))
    tly = int(np.clip(pos[1] - cam_h // 2, 0, H - cam_h))
    views = frames[: params.imaging_n, tly : tly + cam_h, tlx : tlx + cam_w]
    want = np.array(detect_top1(model, variables, jnp.asarray(views), cfg.imgsz, cfg.conf))
    want[:, 0] += tlx
    want[:, 1] += tly

    got = np.asarray(logs.worm_bboxes)[0, : params.imaging_n]
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_video_loop_pallas_preproc_matches(video):
    """The fused Pallas preprocessing path equals the unfused path."""
    from jax.experimental.pallas import tpu as pltpu

    frames, traj = video
    exp = ExperimentConfig("vid", len(frames), 60, frames.shape[1:], 90, (180, 150))
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    params = EngineParams.from_timing(timing, frames.shape[1:])
    model, variables, predictor = _models()
    source = lambda s, n: frames[s : s + n]

    # note: square camera required; TIMING_KWARGS camera is (1.2, 1.1) mm ->
    # rectangular, so build a square-camera timing here
    timing_sq = TimingConfig(
        experiment_config=ExperimentConfig("vid", len(frames), 60, frames.shape[1:], 90, (180, 150)),
        imaging_time_ms=75.0, pred_time_ms=30.0, moving_time_ms=50.0,
        camera_size_mm=(1.2, 1.2), micro_size_mm=(0.25, 0.25),
    )
    params_sq = EngineParams.from_timing(timing_sq, frames.shape[1:])

    cfg_plain = LiveLoopConfig(imgsz=(64, 64), conf=0.0, ring_size=32, log_mode=True, max_dist_per_pred=20.0)
    cfg_pallas = LiveLoopConfig(
        imgsz=(64, 64), conf=0.0, ring_size=32, log_mode=True, max_dist_per_pred=20.0,
        use_pallas_preproc=True,
    )

    a = run_video_live(params_sq, cfg_plain, source, len(frames), model, variables, predictor, (180, 150), cycles_per_chunk=16)
    with pltpu.force_tpu_interpret_mode():
        b = run_video_live(params_sq, cfg_pallas, source, len(frames), model, variables, predictor, (180, 150), cycles_per_chunk=16)

    np.testing.assert_array_equal(np.asarray(a.positions), np.asarray(b.positions))
    np.testing.assert_allclose(
        np.asarray(a.worm_bboxes), np.asarray(b.worm_bboxes), atol=1e-2, equal_nan=True
    )

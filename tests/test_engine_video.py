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


def _window_source(frames):
    """In-memory window_source matching FrameReader.read_window_batch's contract."""

    def source(start, count, top_lefts, out=None):
        tls = np.asarray(top_lefts, dtype=int)
        assert out is not None  # the ROI loop always streams into scratch buffers
        win_h, win_w = out.shape[1:3]
        for i, (x, y) in enumerate(tls):
            out[i] = frames[start + i, y : y + win_h, x : x + win_w]
        return out

    return source


def test_video_roi_matches_full(video):
    """ROI streaming (speculated windows) is bit-identical to full frames."""
    frames, traj = video
    exp = ExperimentConfig("vid", len(frames), 60, frames.shape[1:], 90, (180, 150))
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    params = EngineParams.from_timing(timing, frames.shape[1:])

    model, variables, predictor = _models()
    cfg = LiveLoopConfig(imgsz=(64, 64), conf=0.0, ring_size=32, log_mode=True, max_dist_per_pred=20.0)
    source = lambda s, n: frames[s : s + n]

    full = run_video_live(
        params, cfg, source, len(frames), model, variables, predictor, exp.init_position, cycles_per_chunk=16
    )
    stats = {}
    roi = run_video_live(
        params, cfg, source, len(frames), model, variables, predictor, exp.init_position,
        window_source=_window_source(frames), roi_window=168, roi_chunk_cycles=4, roi_stats=stats,
    )
    np.testing.assert_array_equal(np.asarray(full.positions), np.asarray(roi.positions))
    np.testing.assert_array_equal(np.asarray(full.worm_bboxes), np.asarray(roi.worm_bboxes))
    assert stats["chunks"] > 0


def test_video_roi_recovery_replays_missed_windows(video):
    """A window barely larger than the camera view forces speculation misses;
    replay recovery must still reproduce the full-frame run exactly."""
    frames, traj = video
    exp = ExperimentConfig("vid", len(frames), 60, frames.shape[1:], 90, (180, 150))
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    params = EngineParams.from_timing(timing, frames.shape[1:])

    model, variables, predictor = _models()
    cfg = LiveLoopConfig(imgsz=(64, 64), conf=0.0, ring_size=32, log_mode=True, max_dist_per_pred=20.0)
    source = lambda s, n: frames[s : s + n]

    full = run_video_live(
        params, cfg, source, len(frames), model, variables, predictor, exp.init_position, cycles_per_chunk=16
    )
    # camera is (cam_h, cam_w) = (99, 108); a (102, 112) window leaves ~2 px of
    # slack, so almost any platform move escapes it
    stats = {}
    roi = run_video_live(
        params, cfg, source, len(frames), model, variables, predictor, exp.init_position,
        window_source=_window_source(frames),
        roi_window=(params.cam_h + 3, params.cam_w + 4),
        roi_chunk_cycles=8,
        roi_stats=stats,
    )
    np.testing.assert_array_equal(np.asarray(full.positions), np.asarray(roi.positions))
    np.testing.assert_array_equal(np.asarray(full.worm_bboxes), np.asarray(roi.worm_bboxes))
    assert stats["replays"] > 0  # the tight window must actually have missed


def test_video_roi_int8_matches_full(video):
    """ROI streaming through the int8 detect_fn hook (the deployment form)
    equals the int8 full-frame run bit-for-bit."""
    frames, traj = video
    exp = ExperimentConfig("vid", len(frames), 60, frames.shape[1:], 90, (180, 150))
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    params = EngineParams.from_timing(timing, frames.shape[1:])

    model, variables, predictor = _models()
    from wtracker_tpu.models.yolov8 import fuse_conv_bn
    from wtracker_tpu.models.yolov8_int8 import detect_top1_int8, quantize_detector

    fused = fuse_conv_bn(variables)
    from wtracker_tpu.models.yolov8 import YoloV8

    fmodel = YoloV8(nc=1, scale="n", fused=True)
    calib = frames[:8, : params.cam_h, : params.cam_w].astype(np.float32)
    q = quantize_detector(fmodel, fused, calib, (64, 64))
    qw = q.device_weights()

    def detect_int8(m, v, views, imgsz, conf):
        return detect_top1_int8(q, v, views, imgsz, conf)

    cfg = LiveLoopConfig(imgsz=(64, 64), conf=0.0, ring_size=32, log_mode=True, max_dist_per_pred=20.0)
    source = lambda s, n: frames[s : s + n]
    kw = dict(detect_fn=detect_int8)
    full = run_video_live(
        params, cfg, source, len(frames), fmodel, qw, predictor, exp.init_position,
        cycles_per_chunk=16, **kw,
    )
    roi = run_video_live(
        params, cfg, source, len(frames), fmodel, qw, predictor, exp.init_position,
        window_source=_window_source(frames), roi_window=168, roi_chunk_cycles=4, **kw,
    )
    np.testing.assert_array_equal(np.asarray(full.positions), np.asarray(roi.positions))
    np.testing.assert_array_equal(np.asarray(full.worm_bboxes), np.asarray(roi.worm_bboxes))


def test_video_roi_requires_window_source(video):
    frames, _ = video
    exp = ExperimentConfig("vid", len(frames), 60, frames.shape[1:], 90, (180, 150))
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    params = EngineParams.from_timing(timing, frames.shape[1:])
    model, variables, predictor = _models()
    cfg = LiveLoopConfig(imgsz=(64, 64), conf=0.0, ring_size=32, log_mode=True, max_dist_per_pred=20.0)
    with pytest.raises(ValueError, match="window_source"):
        run_video_live(
            params, cfg, lambda s, n: frames[s : s + n], len(frames), model, variables,
            predictor, exp.init_position, roi_window=168,
        )


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


# ---------------------------------------------------------------------------
# sharded real-video path (VERDICT r4 item 4)
# ---------------------------------------------------------------------------


def _make_recordings(S, F=128, H=300, W=360):
    """S synthetic recordings with distinct trajectories."""
    recs = []
    for s in range(S):
        rng = np.random.default_rng(100 + s)
        traj = make_trajectory(F, (H, W), seed=50 + s, margin=50)
        bg = rng.integers(20, 40, (H, W), dtype=np.uint8)
        frames = np.repeat(bg[None], F, axis=0)
        for i in range(F):
            x, y = int(traj[i, 0]), int(traj[i, 1])
            frames[i, max(y - 4, 0) : y + 4, max(x - 6, 0) : x + 6] = 220
        recs.append(frames)
    return recs


def test_video_sharded_matches_single_stream():
    """The stream-sharded video loop reproduces S independent single-stream
    runs, and sharding over a mesh changes nothing vs the same batched program
    on one device."""
    from wtracker_tpu.parallel import make_mesh
    from wtracker_tpu.sim.engine_video import run_video_live_sharded

    S, F = 4, 128
    recs = _make_recordings(S, F)
    H, W = recs[0].shape[1:]
    exp = ExperimentConfig("vid", F, 60, (H, W), 90, (180, 150))
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    params = EngineParams.from_timing(timing, (H, W))

    model, variables, predictor = _models()
    cfg = LiveLoopConfig(imgsz=(64, 64), conf=0.0, ring_size=32, log_mode=True, max_dist_per_pred=20.0)

    init_pos = np.tile([180, 150], (S, 1))

    def _src(fr):
        # exactly two params: run_video_live treats a 3rd param as an `out=`
        # decode target (FrameReader.read_batch contract)
        return lambda start, count: fr[start : start + count]

    sources = [_src(fr) for fr in recs]

    mesh = make_mesh(S, axis="streams")
    sharded = run_video_live_sharded(
        params, cfg, sources, F, model, variables, predictor, init_pos,
        cycles_per_chunk=6, mesh=mesh,
    )
    n_cycles = params.n_logged_cycles(F)
    assert np.asarray(sharded.positions).shape == (n_cycles, S, params.cycle_n, 2)

    # 1) sharded == the same batched program on one device (bit-identical)
    single = run_video_live_sharded(
        params, cfg, sources, F, model, variables, predictor, init_pos,
        cycles_per_chunk=6, mesh=None,
    )
    np.testing.assert_array_equal(np.asarray(sharded.positions), np.asarray(single.positions))
    np.testing.assert_array_equal(np.asarray(sharded.worm_bboxes), np.asarray(single.worm_bboxes))

    # 2) each stream == its own single-stream run_video_live (the audited path)
    for s in range(S):
        solo = run_video_live(
            params, cfg, sources[s], F, model, variables, predictor, (180, 150),
            cycles_per_chunk=6,
        )
        np.testing.assert_array_equal(
            np.asarray(sharded.positions)[:, s], np.asarray(solo.positions)
        )
        np.testing.assert_allclose(
            np.asarray(sharded.worm_bboxes)[:, s], np.asarray(solo.worm_bboxes),
            atol=1e-4, equal_nan=True,
        )


def test_video_roi_pathological_fast_worm_bounded_replays():
    """Adversarial ROI case (VERDICT r4 item 7): a worm sprinting in zigzags
    at ~6 px/frame with a window only a few px larger than the camera view.
    The constant-velocity speculation misses at every direction change; the
    run must still complete, reproduce the full-frame logs EXACTLY, and do so
    with a bounded number of replays per chunk (no thrashing)."""
    H, W, F = 300, 360, 256
    # zigzag sprint: direction flips every 24 frames, 6 px/frame
    pos = np.empty((F, 2))
    pos[0] = (80, 80)
    d = np.array([6.0, 4.5])
    for i in range(1, F):
        if i % 24 == 0:
            d = -d if i % 48 == 0 else np.array([-d[0], d[1]])
        pos[i] = pos[i - 1] + d
        for a, lim in ((0, W), (1, H)):
            if not (40 <= pos[i, a] <= lim - 40):
                d[a] = -d[a]
                pos[i, a] = pos[i - 1, a] + d[a]
    rng = np.random.default_rng(5)
    frames = np.repeat(rng.integers(20, 40, (H, W), dtype=np.uint8)[None], F, axis=0)
    for i in range(F):
        x, y = int(pos[i, 0]), int(pos[i, 1])
        frames[i, max(y - 4, 0) : y + 4, max(x - 6, 0) : x + 6] = 220

    exp = ExperimentConfig("vid", F, 60, (H, W), 90, (80, 80))
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    params = EngineParams.from_timing(timing, (H, W))

    model, variables, predictor = _models()
    cfg = LiveLoopConfig(imgsz=(64, 64), conf=0.0, ring_size=32, log_mode=True, max_dist_per_pred=60.0)
    source = lambda s, n: frames[s : s + n]

    full = run_video_live(
        params, cfg, source, F, model, variables, predictor, exp.init_position, cycles_per_chunk=16
    )
    stats = {}
    roi = run_video_live(
        params, cfg, source, F, model, variables, predictor, exp.init_position,
        window_source=_window_source(frames),
        roi_window=(params.cam_h + 4, params.cam_w + 4),  # minimal slack
        roi_chunk_cycles=4,
        roi_stats=stats,
    )
    np.testing.assert_array_equal(np.asarray(full.positions), np.asarray(roi.positions))
    np.testing.assert_array_equal(np.asarray(full.worm_bboxes), np.asarray(roi.worm_bboxes))
    assert stats["replays"] > 0, "the adversarial setup must actually force misses"
    # bounded recovery, not thrash: each replay verifies at least one more
    # cycle, so a chunk can never need more than its chunk_cycles·cycle_n+1
    # scan bound (33 here); in this worst case (direction flips inside a
    # window with 4 px of slack) recovery advances about a cycle per replay,
    # i.e. <= 2·chunk_cycles per chunk and ~2 per chunk on average (measured
    # {'chunks': 8, 'replays': 14, 'max_chunk_replays': 7})
    assert stats["max_chunk_replays"] <= 2 * 4, stats
    assert stats["replays"] <= 2 * stats["chunks"], stats

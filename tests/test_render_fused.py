"""Render→stem fusion (sim/render_fused.py): parity vs render-then-stem.

The fusion must be the same computation reassociated — these tests pin the
f32 math tightly and the bf16 serving path to sub-pixel box agreement.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from wtracker_tpu.models.yolov8 import (
    YoloV8,
    YoloV8Detector,
    fold_stem_matrices,
    fuse_conv_bn,
    make_folded_detect,
    stem_apply,
)
from wtracker_tpu.sim.render_fused import (
    _build_tables,
    make_fused_render_detect,
    render_stem,
    scene_is_clip_free,
)
from wtracker_tpu.sim.synthetic import SyntheticScene, make_trajectory

SRC, IMGSZ = (56, 56), (64, 64)


def _views_setup(n=10, seed=7):
    scene = SyntheticScene()
    traj = make_trajectory(64, (160, 160), seed=seed)
    xy = jnp.asarray(traj[:n], jnp.float32)
    tls = jnp.clip(xy - 28, 0, 160 - 56).astype(jnp.float32)
    fidx = jnp.arange(n)
    return scene, xy, tls, fidx


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-3), (jnp.bfloat16, 0.05)])
def test_render_stem_matches_render_then_stem(dtype, tol):
    scene, xy, tls, fidx = _views_setup()
    det = YoloV8Detector.init_random(nc=1, scale="n", imgsz=IMGSZ, compute_dtype=dtype, seed=3)
    variables = fuse_conv_bn(det.variables)
    stem_params = variables["params"]["b0"]["conv"]

    folded = fold_stem_matrices(SRC, IMGSZ, dtype=dtype)
    views = scene.render_views(xy, tls, SRC, fidx)
    ref = np.asarray(stem_apply(folded, stem_params, views), np.float32)

    tab = _build_tables(SRC, IMGSZ, dtype)
    weff = stem_params["kernel"].astype(jnp.float32).sum(axis=2).reshape(9, -1)
    got = np.asarray(
        render_stem(scene, tab, weff, stem_params["bias"], xy, tls, fidx, SRC), np.float32
    )

    assert got.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-3)
    assert np.abs(got - ref).max() <= tol * scale, (
        f"fused stem drift {np.abs(got - ref).max()} vs scale {scale}"
    )


def test_clip_guard():
    assert scene_is_clip_free(SyntheticScene())
    hot = SyntheticScene(bg_level=120.0, worm_intensity=160.0)  # 120+15+160 > 255
    assert not scene_is_clip_free(hot)
    model = YoloV8(nc=1, scale="n", compute_dtype=jnp.bfloat16, fused=True)
    assert make_fused_render_detect(model, hot, SRC, IMGSZ, conf=0.1) is None
    # padded letterbox geometry can't fold either
    assert make_fused_render_detect(model, SyntheticScene(), (50, 70), IMGSZ, conf=0.1) is None


@pytest.mark.parametrize("batch_fold", [0, 8])
def test_fused_render_detect_matches_folded_detect(batch_fold):
    scene, xy, tls, fidx = _views_setup()
    det = YoloV8Detector.init_random(nc=1, scale="n", imgsz=IMGSZ, compute_dtype=jnp.bfloat16, seed=3)
    model = YoloV8(nc=1, scale="n", compute_dtype=jnp.bfloat16, fused=True)
    variables = fuse_conv_bn(det.variables)

    plain = make_folded_detect(model, SRC, IMGSZ)
    views = scene.render_views(xy, tls, SRC, fidx)
    ref = np.asarray(plain(None, variables, views, None, 0.0))

    fused = make_fused_render_detect(model, scene, SRC, IMGSZ, conf=0.0, batch_fold=batch_fold)
    assert fused is not None and fused.fuses_render
    got = np.asarray(fused(variables, xy, tls, fidx))

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=0.75)  # bf16 reassociation, sub-px


def test_fused_render_detect_int8_matches_folded():
    """The int8 fused-render hook agrees with the int8 folded-stem detect on
    rendered views (same requant point, render reassociated in bf16)."""
    from wtracker_tpu.models.yolov8_int8 import make_detect_fns, quantize_detector
    from wtracker_tpu.sim.render_fused import make_fused_render_detect_int8

    scene, xy, tls, fidx = _views_setup()
    det = YoloV8Detector.init_random(nc=1, scale="n", imgsz=IMGSZ, compute_dtype=jnp.bfloat16, seed=3)
    model = YoloV8(nc=1, scale="n", compute_dtype=jnp.bfloat16, fused=True)
    variables = fuse_conv_bn(det.variables)
    views = scene.render_views(xy, tls, SRC, fidx)

    q = quantize_detector(model, variables, np.asarray(views[:6]), IMGSZ)
    qw = q.device_weights()
    plain, _ = make_detect_fns(q, src_hw=SRC, imgsz=IMGSZ)
    ref = np.asarray(plain(None, qw, views, None, 0.0))

    fused = make_fused_render_detect_int8(q, scene, SRC, IMGSZ, conf=0.0, batch_fold=8)
    assert fused is not None and fused.fuses_render
    got = np.asarray(fused(qw, xy, tls, fidx))

    assert got.shape == ref.shape
    # the stem runs in bf16 either way; requantization at b0 clamps most of
    # the reassociation, but a borderline int8 level can still flip
    np.testing.assert_allclose(got, ref, atol=1.5)


def test_fuse_render_live_loop_equivalence():
    """End-to-end: the fused-render live loop tracks identically (integer
    platform positions) to the render-then-detect loop."""
    from wtracker_tpu.models.resmlp import make_rmlp_predictor
    from wtracker_tpu.neural.config import IOConfig
    from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
    from wtracker_tpu.sim.engine import EngineParams, headless_frame_shape, run_engine_streams
    from wtracker_tpu.sim.engine_live import LiveLoopConfig, make_stream_batch_fused

    exp = ExperimentConfig("rf", 400, 60, (300, 300), 90, (150, 150))
    timing = TimingConfig(
        experiment_config=exp, imaging_time_ms=200.0, pred_time_ms=40.0, moving_time_ms=50.0,
        camera_size_mm=(72 / 90, 72 / 90), micro_size_mm=(0.08, 0.08),
    )
    params = EngineParams.from_timing(timing, headless_frame_shape(timing, exp.orig_resolution))
    assert (params.cam_h, params.cam_w) == (72, 72)  # 72 -> 64 letterbox, padding-free

    det = YoloV8Detector.init_random(nc=1, scale="n", imgsz=IMGSZ, compute_dtype=jnp.bfloat16, seed=0)
    model = YoloV8(nc=1, scale="n", compute_dtype=jnp.bfloat16, fused=True)
    dv = fuse_conv_bn(det.variables)
    predictor = make_rmlp_predictor(IOConfig([0, -3, -6], [3]))
    scene = SyntheticScene()
    trajs = np.stack([make_trajectory(400, (300, 300), seed=i) for i in range(2)])
    init_pos = np.tile([150, 150], (2, 1))

    logs = {}
    for fuse in (False, True):
        cfg = LiveLoopConfig(
            imgsz=IMGSZ, conf=0.0, ring_size=32, log_mode=True,
            max_dist_per_pred=54.0, detect_chunks=2, fuse_render=fuse,
        )
        ctl = make_stream_batch_fused(params, cfg, scene, trajs, model, dv, predictor)
        out = run_engine_streams(params, ctl, init_pos, 4, delayed_log=True)
        logs[fuse] = np.asarray(out.positions)
        assert np.isfinite(logs[fuse]).all()

    # integer platform positions: bf16 reassociation may flip a rounded px
    assert np.abs(logs[True] - logs[False]).max() <= 1.0

    # int8 fused-render hook through the same engine (the bench deployment
    # path): the engine must route the no-views contract via detect_fn
    from wtracker_tpu.models.yolov8_int8 import quantize_detector
    from wtracker_tpu.sim.render_fused import make_fused_render_detect_int8

    xy8 = jnp.asarray(trajs[0, :8], jnp.float32)
    calib = np.asarray(
        scene.render_views(xy8, jnp.clip(xy8 - 36, 0, 300 - 72), (72, 72), jnp.arange(8))
    )
    q = quantize_detector(model, dv, calib, IMGSZ)
    hook = make_fused_render_detect_int8(q, scene, (72, 72), IMGSZ, conf=0.0, batch_fold=8)
    cfg8 = LiveLoopConfig(imgsz=IMGSZ, conf=0.0, ring_size=32, log_mode=True,
                          max_dist_per_pred=54.0, detect_chunks=2)
    ctl8 = make_stream_batch_fused(
        params, cfg8, scene, trajs, model, q.device_weights(), predictor, detect_fn=hook
    )
    out8 = run_engine_streams(params, ctl8, init_pos, 4, delayed_log=True)
    assert np.isfinite(np.asarray(out8.positions)).all()

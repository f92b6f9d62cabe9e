"""Mixed-geometry experiment sweeps: one compiled engine over streams whose
arenas differ.

The reference's five experiments (exp0–exp4) share one timing regime but
differ in resolution (1400–1600 px), camera pixel size (px_per_mm 88–92 →
352–368 px), init position, and frame count
(/root/reference/experiments/exp*/exp_config.json).  The reference runs them
serially, one notebook execution each; here they run as ONE ``lax.scan`` over
a stream batch:

* every stream clamps the platform to its *own* arena bounds
  (``consts["stream_bounds"]``, honored by the engine's stream motor);
* the playback/decision math uses per-stream camera sizes;
* shorter experiments are NaN-padded to the longest one and trimmed per
  stream at write time.

Timing must quantize identically across the streams (same frame counts per
phase and motor weights) — that is what makes one compiled cycle shape
possible; geometry is free to differ.  Verified bit-identical per experiment
against independent single-stream runs in tests/test_engine_hetero.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
from wtracker_tpu.sim.engine import (
    CycleController,
    CycleLog,
    DecideCtx,
    EngineParams,
    headless_frame_shape,
    logs_to_frame,
    run_engine_streams,
)


class StreamGeometry(NamedTuple):
    """Per-stream arena/view geometry of a mixed sweep."""

    cam_size: np.ndarray  # (S, 2) int32 (w, h)
    mic_size: np.ndarray  # (S, 2) int32 (w, h)
    bounds: np.ndarray  # (S, 2) int32 (w, h) platform clamp bounds
    num_frames: np.ndarray  # (S,) int — per-stream experiment length


def bucket_by_cycle_shape(timings: list[TimingConfig]) -> list[list[int]]:
    """Group experiment indices by quantized cycle shape.

    One compiled engine program requires one (imaging, pred, moving) frame
    schedule; timings that quantize differently cannot share it
    (:func:`geometry_from_configs` raises).  This is the splitter a mixed
    sweep uses to run each timing regime as its own compiled group: indices
    come back in first-seen order, each bucket preserving input order — the
    reference analogue is simply running each experiment's notebook with its
    own TimingConfig (wtracker/sim/config.py:46-67).
    """
    buckets: dict[tuple, list[int]] = {}
    for i, t in enumerate(timings):
        key = (t.imaging_frame_num, t.pred_frame_num, t.moving_frame_num)
        buckets.setdefault(key, []).append(i)
    return list(buckets.values())


def geometry_from_configs(
    timings: list[TimingConfig], experiments: list[ExperimentConfig]
) -> tuple[EngineParams, StreamGeometry]:
    """Common EngineParams + per-stream geometry for a mixed sweep.

    Raises if the timings don't quantize to one cycle shape (then the sweep
    cannot share a compiled program and must be split into timing groups).
    """
    assert len(timings) == len(experiments) > 0
    p0 = EngineParams.from_timing(timings[0], headless_frame_shape(timings[0], experiments[0].orig_resolution))

    cams, mics, bounds, lengths = [], [], [], []
    for t, e in zip(timings, experiments):
        schedule = (t.imaging_frame_num, t.pred_frame_num, t.moving_frame_num)
        if schedule != (p0.imaging_n, p0.pred_n, p0.moving_n):
            raise ValueError(
                f"experiment {e.name!r} quantizes to cycle shape {schedule}, "
                f"others to {(p0.imaging_n, p0.pred_n, p0.moving_n)} — split the sweep by timing"
            )
        h, w = headless_frame_shape(t, e.orig_resolution)
        cams.append(t.camera_size_px)
        mics.append(t.micro_size_px)
        bounds.append((w, h))
        lengths.append(e.num_frames)

    geometry = StreamGeometry(
        cam_size=np.asarray(cams, dtype=np.int32),
        mic_size=np.asarray(mics, dtype=np.int32),
        bounds=np.asarray(bounds, dtype=np.int32),
        num_frames=np.asarray(lengths, dtype=np.int64),
    )
    # the common params keep the first stream's view sizes (unused by the
    # hetero controller) and the max bounds (a conservative fallback)
    params = EngineParams(
        imaging_n=p0.imaging_n,
        pred_n=p0.pred_n,
        moving_n=p0.moving_n,
        cam_w=p0.cam_w,
        cam_h=p0.cam_h,
        mic_w=p0.mic_w,
        mic_h=p0.mic_h,
        frame_w=int(geometry.bounds[:, 0].max()),
        frame_h=int(geometry.bounds[:, 1].max()),
        motor_weights=p0.motor_weights,
    )
    return params, geometry


def pad_worm_tables(tables: list[np.ndarray]) -> np.ndarray:
    """Stack per-experiment (Nᵢ, 4) worm tables into (S, max N, 4), NaN-padded
    — out-of-range rows behave exactly like out-of-range frame queries."""
    n = max(len(t) for t in tables)
    out = np.full((len(tables), n, 4), np.nan)
    for i, t in enumerate(tables):
        out[i, : len(t)] = np.asarray(t, dtype=float)
    return out


def _gather_streams(csv: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(S, N, 4) table + (k,) frame indices → (S, k, 4), NaN out of range."""
    n = csv.shape[1]
    valid = (idx >= 0) & (idx < n)
    rows = jnp.take(csv, jnp.clip(idx, 0, n - 1), axis=1)
    return jnp.where(valid[..., None], rows, jnp.nan)


def _decision_positions(params: EngineParams, ctx: DecideCtx) -> jnp.ndarray:
    """Per-stream platform position backing the decision query's camera bbox —
    the deque-ring quirk of CsvController.predict (engine.py
    ``_decision_cam_topleft``), lifted to a stream batch."""
    g_offset = 2 * params.imaging_n - params.pred_n + 1 - params.cycle_n
    if g_offset >= 0:
        return ctx.position
    prev = ctx.prev_positions[:, params.cycle_n + g_offset]
    return jnp.where(ctx.cycle == 0, ctx.position, prev)  # scalar cycle broadcasts


def csv_controller_hetero(
    csv_data: np.ndarray, params: EngineParams, geometry: StreamGeometry
) -> CycleController:
    """Stream-batched ground-truth playback over heterogeneous arenas.

    ``csv_data`` is (S, N, 4) (see :func:`pad_worm_tables`); per-stream camera
    sizes drive the decision/logging coordinate math, and the engine's stream
    motor clamps to ``geometry.bounds``.
    """
    consts = {
        "csv": jnp.asarray(csv_data, dtype=jnp.float64),
        "cam_half": jnp.asarray(geometry.cam_size // 2, dtype=jnp.int32),  # (S, 2)
        "cam_mid": jnp.asarray(geometry.cam_size, dtype=jnp.float64) / 2,  # (S, 2)
        "stream_bounds": jnp.asarray(geometry.bounds, dtype=jnp.int32),
    }

    def decide(consts, state, ctx: DecideCtx):
        f = ctx.cycle * params.cycle_n + params.imaging_n
        bbox = _gather_streams(consts["csv"], jnp.full((1,), f - params.pred_n))[:, 0]  # (S, 4)
        pos = _decision_positions(params, ctx)
        cam_tl = (pos - consts["cam_half"]).astype(jnp.float64)
        rel_xy = bbox[:, :2] - cam_tl
        center = rel_xy + bbox[:, 2:] / 2
        target = center - consts["cam_mid"]
        valid = jnp.isfinite(bbox).all(axis=1)
        return state, jnp.where(valid[:, None], jnp.round(target), 0.0).astype(jnp.int32)

    def predict_all(consts, state, cycle_idx, positions):
        idx = cycle_idx * params.cycle_n + jnp.arange(params.cycle_n)
        rows = _gather_streams(consts["csv"], idx)  # (S, L, 4)
        cam_tl = (positions - consts["cam_half"][:, None, :]).astype(jnp.float64)
        # replay the host's camera-coords round trip for bit parity
        rel = jax.lax.optimization_barrier(rows[..., :2] - cam_tl)
        return jnp.concatenate([rel + cam_tl, rows[..., 2:]], axis=-1)

    return CycleController(
        init=lambda: (),
        decide=decide,
        predict_all=predict_all,
        consts=consts,
        cache_key=("csv_hetero",),
    )


def yolo_mlp_controller_hetero(
    params: EngineParams,
    geometry: StreamGeometry,
    config,
    scene,
    gt_trajs: np.ndarray,
    detector_model,
    detector_variables: dict,
    predictor,
    canvas_hw: tuple[int, int] | None = None,
    forward_fn=None,
) -> CycleController:
    """Live YOLO+MLP tracking across streams with heterogeneous cameras.

    The reference runs its YoloController on each experiment's own geometry,
    one notebook execution at a time (yolo_controller.py:49-109 +
    experiments/exp*/exp_config.json); here the exp0–exp4-style mixed set
    runs as ONE compiled stream batch:

    * every view renders into a shared max-size canvas, with the worm window
      clamped to the stream's own camera extent (bit-identical content to a
      native-size render — :meth:`SyntheticScene.render_view` ``content_wh``);
    * each stream letterboxes by its own geometry's matmul operator
      (:func:`~wtracker_tpu.ops.image.letterbox_indexed`), so the detector
      still sees ONE fixed (B, imgsz, imgsz, 3) batch;
    * decision/logging math uses per-stream camera sizes, and the platform
      clamps to per-stream arena bounds (``consts["stream_bounds"]``).

    Args:
        config: a :class:`~wtracker_tpu.sim.engine_live.LiveLoopConfig`.
        gt_trajs: (S, F, 2) per-stream ground-truth trajectories.
        canvas_hw: render canvas override (defaults to the max camera size;
            pass explicitly to pin shapes across runs for parity tests).
        forward_fn: ``(detector_variables, x) -> (box_logits, cls_logits)``
            override of the detector forward on the letterboxed batch — e.g.
            ``QuantizedYolo.apply`` for the int8 serving path (decode and
            per-geometry unletterboxing stay shared).
    """
    from wtracker_tpu.models.yolov8 import top1_source_boxes
    from wtracker_tpu.ops.image import letterbox_indexed, make_letterbox_matrices

    S = gt_trajs.shape[0]
    # device-resident ONCE at build time: a fresh jnp.asarray inside init()
    # would re-upload the (S, F, 2) table through the tunnel on every
    # run_engine_streams call (46 MB ~ 0.5 s/window at bench scale)
    gt0 = jnp.asarray(gt_trajs, dtype=jnp.float32)
    R = config.ring_size
    L = params.cycle_n
    IM, MV = params.imaging_n, params.moving_n
    io = predictor.io_config
    input_frames = jnp.asarray(io.input_frames, dtype=jnp.int32)
    mlp_model = predictor.model

    cam_wh = np.asarray(geometry.cam_size)  # (S, 2) as (w, h)
    if canvas_hw is None:
        canvas_hw = (int(cam_wh[:, 1].max()), int(cam_wh[:, 0].max()))

    # unique camera geometries → letterbox operators + per-stream ids
    unique_hw: list[tuple[int, int]] = []
    geom_id = np.zeros(S, dtype=np.int32)
    for i, (w, h) in enumerate(map(tuple, cam_wh)):
        hw = (int(h), int(w))
        if hw not in unique_hw:
            unique_hw.append(hw)
        geom_id[i] = unique_hw.index(hw)
    mat_y, mat_x, cov_y, cov_x, geoms = make_letterbox_matrices(
        unique_hw, canvas_hw, config.imgsz, dtype=detector_model.compute_dtype
    )
    _forward = forward_fn or (lambda v, x: detector_model.apply(v, x, train=False))
    scales = jnp.asarray([g[0] for g in geoms], jnp.float32)
    pads = jnp.asarray([[g[2], g[1]] for g in geoms], jnp.float32)  # (G, 2) xy

    consts = {
        "det": detector_variables,
        "mlp": predictor.variables,
        "mat_y": mat_y,
        "mat_x": mat_x,
        "cov_y": cov_y,
        "cov_x": cov_x,
        "geom_scale": scales,
        "geom_pad": pads,
        "geom_id": jnp.asarray(geom_id),
        "cam_half": jnp.asarray(cam_wh // 2, dtype=jnp.int32),  # (S, 2)
        "cam_mid": jnp.asarray(cam_wh, dtype=jnp.float32) / 2,  # (S, 2)
        "cam_wh": jnp.asarray(cam_wh, dtype=jnp.int32),
        "stream_bounds": jnp.asarray(geometry.bounds, dtype=jnp.int32),
    }

    def _render_detect(consts, worm_xy, cam_tls, fidx, gids, per_view):
        views = scene.render_views(
            worm_xy, cam_tls.astype(jnp.float32), canvas_hw, fidx, content_whs=per_view
        )
        x = letterbox_indexed(
            views,
            gids,
            consts["mat_y"],
            consts["mat_x"],
            consts["cov_y"],
            consts["cov_x"],
            dtype=detector_model.compute_dtype,
        )
        box_logits, cls_logits = _forward(consts["det"], x)
        sc = jnp.take(consts["geom_scale"], gids)
        pd = jnp.take(consts["geom_pad"], gids, axis=0)  # (B, 2) as (left, top)
        out = top1_source_boxes(
            box_logits, cls_logits, config.imgsz, detector_model.reg_max,
            (sc, pd[:, 1], pd[:, 0]), config.conf,
        )
        return out.at[:, :2].add(cam_tls.astype(out.dtype))

    def detect_flat(consts, worm_xy, cam_tls, fidx, gids, per_view):
        n = worm_xy.shape[0]
        k = config.detect_chunks
        if k <= 1 or n % k:
            return _render_detect(consts, worm_xy, cam_tls, fidx, gids, per_view)
        m = n // k
        out = jax.lax.map(
            lambda args: _render_detect(consts, *args),
            (
                worm_xy.reshape(k, m, 2),
                cam_tls.reshape(k, m, 2),
                fidx.reshape(k, m),
                gids.reshape(k, m),
                per_view.reshape(k, m, 2),
            ),
        )
        return out.reshape(n, 4)

    def init():
        return {
            "ring": jnp.full((S, R, 4), jnp.nan, dtype=jnp.float32),
            "stash": jnp.full((S, IM, 4), jnp.nan, dtype=jnp.float32),
            "gt": gt0,
        }

    def decide(consts, state, ctx: DecideCtx):
        gt = state["gt"]
        idx = ctx.cycle * L + jnp.arange(IM)
        safe = jnp.clip(idx, 0, gt.shape[1] - 1)
        worm_xy = gt[:, safe, :].reshape(S * IM, 2)

        cam_tl = ctx.position - consts["cam_half"]  # (S, 2)
        cam_tls = jnp.repeat(cam_tl, IM, axis=0)
        fidx = jnp.tile(idx, S)
        gids = jnp.repeat(consts["geom_id"], IM)
        per_view = jnp.repeat(consts["cam_wh"], IM, axis=0)

        boxes = detect_flat(consts, worm_xy, cam_tls, fidx, gids, per_view).reshape(S, IM, 4)
        ring = state["ring"].at[:, idx % R, :].set(boxes)

        kickoff = ctx.cycle * L + IM - params.pred_n
        f_in = kickoff + input_frames
        feats_abs = jnp.where((f_in >= 0)[None, :, None], ring[:, f_in % R, :], jnp.nan)

        cam_center = cam_tl.astype(jnp.float32) + consts["cam_mid"]
        mlp_valid = jnp.isfinite(feats_abs).all(axis=(1, 2))

        rel = feats_abs[:, 0, :2] - cam_center
        origin = feats_abs[:, 0:1, :2]
        feats = (feats_abs.at[:, :, :2].add(-origin)).reshape(S, -1)
        feats = jnp.where(mlp_valid[:, None], feats, 0.0)

        pred = mlp_model.apply(consts["mlp"], feats.astype(jnp.float32), train=False)
        pred = jnp.clip(pred, -config.max_dist_per_pred, config.max_dist_per_pred)
        mlp_move = jnp.round(pred[:, :2] + rel)

        last_det = ring[:, kickoff % R, :]
        det_valid = jnp.isfinite(last_det).all(axis=1)
        det_center = last_det[:, :2] + last_det[:, 2:] / 2
        det_move = jnp.round(det_center - cam_center)

        dxdy = jnp.where(
            mlp_valid[:, None],
            mlp_move,
            jnp.where(det_valid[:, None], det_move, jnp.zeros((S, 2))),
        ).astype(jnp.int32)

        return {"ring": ring, "stash": boxes, "gt": gt}, dxdy

    def predict_all(consts, state, cycle_idx, positions):
        imaging = state["stash"].astype(jnp.float64)
        if not config.log_mode:
            moving = jnp.full((S, MV, 4), jnp.nan, dtype=jnp.float64)
        else:
            gt = state["gt"]
            idx = cycle_idx * L + IM + jnp.arange(MV)
            safe = jnp.clip(idx, 0, gt.shape[1] - 1)
            worm_xy = gt[:, safe, :].reshape(S * MV, 2)
            cam_tls = (positions[:, IM:, :] - consts["cam_half"][:, None, :]).reshape(S * MV, 2)
            fidx = jnp.tile(idx, S)
            gids = jnp.repeat(consts["geom_id"], MV)
            per_view = jnp.repeat(consts["cam_wh"], MV, axis=0)
            moving = (
                detect_flat(consts, worm_xy, cam_tls, fidx, gids, per_view)
                .reshape(S, MV, 4)
                .astype(jnp.float64)
            )
        return jnp.concatenate([imaging, moving], axis=1)

    return CycleController(
        init=init,
        decide=decide,
        predict_all=predict_all,
        consts=consts,
        cache_key=(
            "live-hetero",
            forward_fn,
            S,
            canvas_hw,
            tuple(map(tuple, cam_wh)),
            config,
            scene,
            repr(detector_model),
            repr(mlp_model),
            tuple(io.input_frames),
        ),
    )


def run_sweep_hetero(
    params: EngineParams,
    geometry: StreamGeometry,
    controller: CycleController,
    init_positions: np.ndarray,
    mesh=None,
):
    """Run the mixed sweep and split the logs back per experiment.

    Returns a list of per-experiment DataFrames (17-column bboxes.csv schema),
    each trimmed to its own experiment length.
    """
    n_cycles = params.n_logged_cycles(int(geometry.num_frames.max()))
    if mesh is not None:
        from wtracker_tpu.parallel import run_engine_sharded

        logs = run_engine_sharded(params, controller, init_positions, n_cycles, mesh, batched_controller=True)
    else:
        logs = run_engine_streams(params, controller, init_positions, n_cycles, batched_controller=True)

    frames = []
    for i in range(len(geometry.num_frames)):
        per = CycleLog(positions=logs.positions[:, i], worm_bboxes=logs.worm_bboxes[:, i])
        df = logs_to_frame(
            params,
            per,
            cam_size=tuple(geometry.cam_size[i]),
            mic_size=tuple(geometry.mic_size[i]),
        )
        own_cycles = params.n_logged_cycles(int(geometry.num_frames[i]))
        frames.append(df.iloc[: own_cycles * params.cycle_n].reset_index(drop=True))
    return frames

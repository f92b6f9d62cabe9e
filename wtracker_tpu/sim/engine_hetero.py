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

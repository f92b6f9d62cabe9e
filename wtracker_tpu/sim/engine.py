"""TPU-native closed-loop engine: the simulation as a ``lax.scan`` over cycles.

This is the performance twin of :mod:`wtracker_tpu.sim.simulator`.  The
reference's per-frame hook dispatch (simulator.py:157-187) is hostile to XLA;
here the *cycle* is the unit of computation and a controller is a pure
function ``(state, ctx) -> (state, (dx, dy))``:

* one scan step simulates one full cycle: imaging-phase positions, the
  movement decision, the motor's integer steps, and per-frame log rows;
* the whole experiment is a single compiled program; many independent worm
  streams batch with ``vmap``; streams shard across chips with ``pjit`` over a
  mesh (see :mod:`wtracker_tpu.parallel`);
* per-frame log rows come back as stacked scan outputs — writing them out
  yields the same 17-column ``bboxes.csv`` as the host simulator, bit for bit
  (tests/test_engine.py proves it against the hook-based loop, which is itself
  proven against the upstream reference).

Reference semantics preserved exactly (SURVEY.md §7):
* positions logged at a moving frame are *pre-step* (simulator.py:182-184
  applies motor movement after ``on_camera_frame``);
* the platform clamps to frame bounds after every motor step, not once per
  cycle (view_controller.py:119-131);
* the sine motor's residual-carrying integer rounding, in float64;
* the CsvController's camera-bbox ring indexing quirk (csv_controller.py:42):
  the camera bbox paired with the decision query can fall in the *previous*
  cycle's moving phase for aggressive timing configs, so the engine carries
  the previous cycle's per-frame positions;
* the final (possibly partial) cycle is never logged.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from wtracker_tpu.ops.polyfit import polyfit, polyvander
from wtracker_tpu.sim.config import TimingConfig
from wtracker_tpu.sim.motor import sine_step_weights


@dataclass(frozen=True)
class EngineParams:
    """Static (trace-time) description of the closed loop."""

    imaging_n: int
    pred_n: int
    moving_n: int
    cam_w: int
    cam_h: int
    mic_w: int
    mic_h: int
    frame_w: int
    frame_h: int
    motor_weights: tuple[float, ...]

    @property
    def cycle_n(self) -> int:
        return self.imaging_n + self.moving_n

    @staticmethod
    def from_timing(
        timing: TimingConfig,
        frame_shape_hw: tuple[int, int],
        motor: str = "sine",
        move_after_ratio: float = 0.5,
    ) -> "EngineParams":
        """Derive engine params from a TimingConfig and the (h, w) frame bounds
        the platform position is clamped to (reader frame shape).

        ``motor`` selects the movement profile: "sine" (the simulator default,
        simulator.py:46-47) or "step" (all-at-once after ``move_after_ratio``
        of the phase, motor_controllers.py:33-55) — both run through the same
        residual-rounding mechanism (a step profile rounds exactly).
        """
        if motor == "sine":
            weights = sine_step_weights(timing.moving_frame_num)
        elif motor == "step":
            from wtracker_tpu.sim.motor import step_weights

            weights = step_weights(timing.moving_frame_num, move_after_ratio)
        else:
            raise ValueError(f"unknown motor profile: {motor}")
        return EngineParams(
            imaging_n=timing.imaging_frame_num,
            pred_n=timing.pred_frame_num,
            moving_n=timing.moving_frame_num,
            cam_w=timing.camera_size_px[0],
            cam_h=timing.camera_size_px[1],
            mic_w=timing.micro_size_px[0],
            mic_h=timing.micro_size_px[1],
            frame_h=int(frame_shape_hw[0]),
            frame_w=int(frame_shape_hw[1]),
            motor_weights=tuple(weights.tolist()),
        )

    def n_logged_cycles(self, num_frames: int) -> int:
        """Complete cycles that end up in the log (the trailing partial cycle
        is dropped, like the reference's logging schedule)."""
        return (num_frames - 1) // self.cycle_n


def headless_frame_shape(timing: TimingConfig, orig_resolution_hw: tuple[int, int]) -> tuple[int, int]:
    """Frame bounds of the simulator's headless (no-video) mode.

    The host simulator builds its dummy reader at the padded resolution
    ``orig + camera//2·2`` — note the reference zips the (w, h) camera padding
    onto the (h, w) resolution (simulator.py:41-43), benign for square cameras;
    reproduced verbatim for parity.
    """
    h, w = orig_resolution_hw
    return (h + timing.camera_size_px[0] // 2 * 2, w + timing.camera_size_px[1] // 2 * 2)


class DecideCtx(NamedTuple):
    """Everything a controller may consult at decision time."""

    cycle: jnp.ndarray  # scalar int32 — current cycle index
    position: jnp.ndarray  # (2,) int32 — platform center during imaging
    prev_positions: jnp.ndarray  # (cycle_n, 2) int32 — last cycle's per-frame positions


class CycleController(NamedTuple):
    """A controller expressed as pure functions over a carried state.

    ``init``        — () -> state pytree (per-stream when vmapped).
    ``decide``      — (consts, state, DecideCtx) -> (state, (2,) int32 move).
    ``predict_all`` — (consts, state, cycle, positions (cycle_n,2)) ->
                      (cycle_n, 4) f64 worm bboxes in *absolute* frame
                      coordinates (NaN = none).
    ``consts``      — loop-invariant data (model weights, playback tables).
                      Threaded into jit as an argument and through the scan as
                      a pass-through carry, so large arrays are never baked as
                      program constants and the compiled runner can be cached
                      and reused across calls (see docs/performance.md).
                      Shared across streams (vmap broadcasts it).
    ``cache_key``   — hashable identity of the *traced program* (controller
                      family + any static config baked into the closures).
                      Factories set it so repeated factory calls — new closure
                      objects — share one compiled runner instead of forcing a
                      retrace per instance (VERDICT round-1 item 6). ``None``
                      falls back to keying on the function objects.
    """

    init: Callable[[], Any]
    decide: Callable[[Any, Any, DecideCtx], tuple[Any, jnp.ndarray]]
    predict_all: Callable[[Any, Any, jnp.ndarray, jnp.ndarray], jnp.ndarray]
    consts: Any = ()
    cache_key: Any = None


class CycleLog(NamedTuple):
    """Stacked per-frame outputs of one cycle (leading axis = cycle_n)."""

    positions: jnp.ndarray  # (cycle_n, 2) int32
    worm_bboxes: jnp.ndarray  # (cycle_n, 4) f64, absolute, NaN = no prediction


def _clamp(pos: jnp.ndarray, params: EngineParams) -> jnp.ndarray:
    return jnp.stack(
        [
            jnp.clip(pos[..., 0], 0, params.frame_w - 1),
            jnp.clip(pos[..., 1], 0, params.frame_h - 1),
        ],
        axis=-1,
    )


def make_cycle_step(params: EngineParams, controller: CycleController):
    """Build the scan body simulating one full cycle.

    Signature: ``cycle_step(consts, (pos, prev_positions, state), cycle_idx)``
    — ``consts`` is broadcast (not vmapped) across streams.
    """

    weights = np.asarray(params.motor_weights, dtype=np.float64)

    def cycle_step(consts, carry, cycle_idx):
        pos, prev_positions, state = carry

        ctx = DecideCtx(cycle=cycle_idx, position=pos, prev_positions=prev_positions)
        state, dxdy = controller.decide(consts, state, ctx)

        # Motor: residual-carrying integer rounding, unrolled over the (small,
        # static) moving phase, with the per-step position clamp.
        d = dxdy.astype(jnp.float64)
        resid = jnp.zeros_like(d)
        moving_positions = []
        p = pos
        for w in weights:
            moving_positions.append(p)  # logged before this step's move
            raw = w * d + resid
            s = jnp.round(raw)
            resid = raw - s
            p = _clamp(p + s.astype(pos.dtype), params)

        positions = jnp.concatenate(
            [
                jnp.broadcast_to(pos, (params.imaging_n, 2)),
                jnp.stack(moving_positions, axis=0),
            ],
            axis=0,
        )

        worm_bboxes = controller.predict_all(consts, state, cycle_idx, positions)

        new_carry = (p, positions, state)
        return new_carry, CycleLog(positions=positions, worm_bboxes=worm_bboxes)

    return cycle_step


def init_carry(params: EngineParams, controller: CycleController, init_position) -> tuple:
    """Fresh engine carry (platform position, last-cycle positions, state)."""
    pos0 = _clamp(jnp.asarray(init_position, dtype=jnp.int32), params)
    prev0 = jnp.broadcast_to(pos0, (params.cycle_n, 2)).astype(jnp.int32)
    return (pos0, prev0, controller.init())


# Compiled-runner cache: the jitted scan depends only on the engine params and
# the controller's functions (consts/carry/cycles are runtime arguments), so
# repeated run_engine* calls must reuse one jit object — a fresh @jax.jit
# closure per call would retrace AND recompile every invocation (measured 30s
# per call through the remote-compile tunnel).
_RUNNER_CACHE: dict = {}


def _controller_key(controller: CycleController) -> tuple:
    if controller.cache_key is not None:
        return ("by-key", controller.cache_key)
    return ("by-id", controller.init, controller.decide, controller.predict_all)


def _single_runner(params: EngineParams, controller: CycleController):
    key = ("single", params, _controller_key(controller))
    if key not in _RUNNER_CACHE:
        step = make_cycle_step(params, controller)

        @jax.jit
        def run(consts, carry0, cycles):
            def body(c, cycle):
                cs, inner = c
                inner, out = step(cs, inner, cycle)
                return (cs, inner), out

            (_, final), logs = jax.lax.scan(body, (consts, carry0), cycles)
            return final, logs

        _RUNNER_CACHE[key] = run
    return _RUNNER_CACHE[key]


def _stream_runner(
    params: EngineParams,
    controller: CycleController,
    batched_controller: bool = False,
    delayed_log: bool = False,
):
    key = ("streams", params, _controller_key(controller), batched_controller, delayed_log)
    if key not in _RUNNER_CACHE:
        if delayed_log:
            batched = make_delayed_cycle_step(params, controller)
        elif batched_controller:
            # controller handles the stream axis itself (flat MXU batches);
            # only the motor/position machinery is vmapped — see
            # make_batched_cycle_step
            batched = make_batched_cycle_step(params, controller)
        else:
            step = make_cycle_step(params, controller)
            batched = jax.vmap(step, in_axes=(None, (0, 0, 0), None))

        @jax.jit
        def run(consts, carry0, cycles):
            def body(c, cycle):
                cs, inner = c
                inner, out = batched(cs, inner, cycle)
                return (cs, inner), out

            (_, final), logs = jax.lax.scan(body, (consts, carry0), cycles)
            return final, logs

        _RUNNER_CACHE[key] = run
    return _RUNNER_CACHE[key]


def run_engine(
    params: EngineParams,
    controller: CycleController,
    init_position: tuple[int, int] | jnp.ndarray,
    n_cycles: int,
    *,
    start_cycle: int = 0,
    carry: tuple | None = None,
    return_carry: bool = False,
):
    """Run the closed loop for ``n_cycles`` complete cycles (jit-compiled).

    Checkpoint/resume: the full simulation state is the (small) scan carry —
    pass ``return_carry=True`` to get it back, persist it with
    ``jax.tree.map(np.asarray, carry)``, and resume later via ``carry=`` +
    ``start_cycle=`` (the reference has no sim resume at all, SURVEY.md §5).

    Returns stacked logs with leading axes ``(n_cycles, cycle_n)``
    (and the final carry when requested).
    """

    run = _single_runner(params, controller)
    if carry is None:
        carry = init_carry(params, controller, init_position)
    cycles = jnp.arange(start_cycle, start_cycle + n_cycles, dtype=jnp.int32)
    final_carry, logs = run(controller.consts, carry, cycles)
    return (logs, final_carry) if return_carry else logs


def _has_stream_bounds(controller: CycleController) -> bool:
    """Heterogeneous-geometry sweeps put per-stream (w, h) clamp bounds into
    ``consts["stream_bounds"]`` — each stream then clamps to its own arena."""
    return isinstance(controller.consts, dict) and "stream_bounds" in controller.consts


def _make_stream_motor(params: EngineParams):
    """Per-stream motor: residual-carrying integer rounding with a per-stream
    (w, h) clamp bound. Vmapped over (pos, dxdy, bound)."""
    weights = np.asarray(params.motor_weights, dtype=np.float64)

    def motor(pos, dxdy, bound):
        d = dxdy.astype(jnp.float64)
        resid = jnp.zeros_like(d)
        moving_positions = []
        p = pos
        for w in weights:
            moving_positions.append(p)
            raw = w * d + resid
            s = jnp.round(raw)
            resid = raw - s
            p = jnp.clip(p + s.astype(pos.dtype), 0, bound - 1)
        positions = jnp.concatenate(
            [jnp.broadcast_to(pos, (params.imaging_n, 2)), jnp.stack(moving_positions, axis=0)],
            axis=0,
        )
        return p, positions

    return jax.vmap(motor)


def _stream_bounds_of(params: EngineParams, controller: CycleController, consts, pos):
    if _has_stream_bounds(controller):
        return consts["stream_bounds"]
    common = jnp.array([params.frame_w, params.frame_h], dtype=pos.dtype)
    return jnp.broadcast_to(common, pos.shape)


def make_batched_cycle_step(params: EngineParams, controller: CycleController):
    """Scan body where the *controller* owns the stream axis.

    ``decide``/``predict_all`` receive stacked (S, ...) inputs and return
    stacked outputs, letting them form flat S·frames device batches (bigger
    matmuls than vmap-of-streams produces).  The motor/clamp machinery is
    vmapped around them.
    """
    motor_v = _make_stream_motor(params)

    def cycle_step(consts, carry, cycle_idx):
        pos, prev_positions, state = carry
        ctx = DecideCtx(cycle=cycle_idx, position=pos, prev_positions=prev_positions)
        state, dxdy = controller.decide(consts, state, ctx)
        p, positions = motor_v(pos, dxdy, _stream_bounds_of(params, controller, consts, pos))
        worm_bboxes = controller.predict_all(consts, state, cycle_idx, positions)
        return (p, positions, state), CycleLog(positions=positions, worm_bboxes=worm_bboxes)

    return cycle_step


def make_delayed_cycle_step(params: EngineParams, controller: CycleController):
    """Batched scan body with one-cycle log delay.

    For controllers that fold the *previous* cycle's trailing work (e.g.
    moving-phase detection) into the current decision batch — one detector
    graph per cycle instead of two.  ``predict_all(consts, state, cycle,
    prev_positions)`` must return the rows of cycle ``cycle − 1``; the step
    emits them with the previous cycle's positions.  The runner scans one
    extra cycle and drops the first (garbage, cycle −1) output row.
    """
    motor_v = _make_stream_motor(params)

    def cycle_step(consts, carry, cycle_idx):
        pos, prev_positions, state = carry
        ctx = DecideCtx(cycle=cycle_idx, position=pos, prev_positions=prev_positions)
        state, dxdy = controller.decide(consts, state, ctx)
        prev_rows = controller.predict_all(consts, state, cycle_idx, prev_positions)
        p, positions = motor_v(pos, dxdy, _stream_bounds_of(params, controller, consts, pos))
        log = CycleLog(positions=prev_positions, worm_bboxes=prev_rows)
        return (p, positions, state), log

    return cycle_step


def run_engine_streams(
    params: EngineParams,
    controller: CycleController,
    init_positions: jnp.ndarray,
    n_cycles: int,
    batched_controller: bool = False,
    delayed_log: bool = False,
) -> CycleLog:
    """Run S independent worm streams in one compiled program.

    ``controller.init()`` must return per-stream state (leading axis S);
    stream-specific data (trajectories, detection rings) lives in that state.
    With ``batched_controller=True`` the controller's decide/predict_all
    receive the full (S, ...) batch themselves instead of being vmapped; with
    ``delayed_log=True`` the controller logs with a one-cycle delay (see
    :func:`make_delayed_cycle_step`).
    Returns logs with leading axes ``(n_cycles, S, cycle_n)``.
    """

    run = _stream_runner(params, controller, batched_controller, delayed_log)

    init = jnp.asarray(init_positions, dtype=jnp.int32)
    if _has_stream_bounds(controller):
        pos0 = jnp.clip(init, 0, jnp.asarray(controller.consts["stream_bounds"], jnp.int32) - 1)
    else:
        pos0 = _clamp(init, params)
    s = pos0.shape[0]
    prev0 = jnp.broadcast_to(pos0[:, None, :], (s, params.cycle_n, 2)).astype(jnp.int32)
    carry0 = (pos0, prev0, controller.init())

    if delayed_log:
        cycles = jnp.arange(n_cycles + 1, dtype=jnp.int32)
        _, logs = run(controller.consts, carry0, cycles)
        return jax.tree.map(lambda x: x[1:], logs)
    _, logs = run(controller.consts, carry0, jnp.arange(n_cycles, dtype=jnp.int32))
    return logs


# ---------------------------------------------------------------------------
# log assembly (host side)
# ---------------------------------------------------------------------------


def logs_to_frame(
    params: EngineParams,
    logs: CycleLog,
    cam_size: tuple[int, int] | None = None,
    mic_size: tuple[int, int] | None = None,
) -> "pd.DataFrame":
    """Flatten engine logs into the 17-column bboxes.csv schema.

    Applies the reference's missing-detection quirk: non-finite worm bboxes are
    written as 0.0 (see LoggingController._log_cycle).  ``cam_size``/``mic_size``
    override the params' view sizes — heterogeneous sweeps pass each stream's
    own (w, h).
    """
    import pandas as pd

    cam_w, cam_h = cam_size if cam_size is not None else (params.cam_w, params.cam_h)
    mic_w, mic_h = mic_size if mic_size is not None else (params.mic_w, params.mic_h)

    n_cycles, L, _ = np.asarray(logs.positions).shape
    pos = np.asarray(logs.positions).reshape(n_cycles * L, 2)
    wrm = np.asarray(logs.worm_bboxes, dtype=float).reshape(n_cycles * L, 4)
    wrm = np.where(np.isfinite(wrm).all(axis=1, keepdims=True), wrm, 0.0)

    frame = np.arange(n_cycles * L)
    cycle = frame // L
    step = frame % L

    return pd.DataFrame(
        {
            "frame": frame,
            "cycle": cycle,
            "phase": np.where(step < params.imaging_n, "imaging", "moving"),
            "plt_x": pos[:, 0],
            "plt_y": pos[:, 1],
            "cam_x": pos[:, 0] - cam_w // 2,
            "cam_y": pos[:, 1] - cam_h // 2,
            "cam_w": cam_w,
            "cam_h": cam_h,
            "mic_x": pos[:, 0] - mic_w // 2,
            "mic_y": pos[:, 1] - mic_h // 2,
            "mic_w": mic_w,
            "mic_h": mic_h,
            "wrm_x": wrm[:, 0],
            "wrm_y": wrm[:, 1],
            "wrm_w": wrm[:, 2],
            "wrm_h": wrm[:, 3],
        }
    )


# ---------------------------------------------------------------------------
# controller builders (ground-truth playback family)
# ---------------------------------------------------------------------------


def _gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """NaN-padded gather: out-of-range indices yield NaN rows."""
    n = table.shape[0]
    valid = (idx >= 0) & (idx < n)
    safe = jnp.clip(idx, 0, n - 1)
    rows = jnp.take(table, safe, axis=0)
    return jnp.where(valid[..., None], rows, jnp.nan)


def _csv_predict_all(params: EngineParams):
    """predict_all for the playback family: the cycle's ground-truth rows.

    The host path shifts rows into camera coordinates and back before logging
    (csv_controller.py:44-48 then logging_controller.py:149-154); the
    subtract/add round trip costs an ulp on some values, so we replay it for
    bit-identical logs.
    """

    def predict_all(consts, state, cycle_idx, positions):
        csv = consts["csv"]
        idx = cycle_idx * params.cycle_n + jnp.arange(params.cycle_n)
        rows = _gather_rows(csv, idx)
        cam_tl = (
            positions - jnp.array([params.cam_w // 2, params.cam_h // 2], dtype=positions.dtype)
        ).astype(jnp.float64)
        rel = jax.lax.optimization_barrier(rows[:, :2] - cam_tl)  # keep the ulp
        xy = rel + cam_tl
        return jnp.concatenate([xy, rows[:, 2:]], axis=1)

    return predict_all


def _decision_cam_topleft(params: EngineParams, ctx: DecideCtx) -> jnp.ndarray:
    """Camera top-left used by CsvController.predict(relative=True) at decision
    time — reproduces the deque ring indexing (csv_controller.py:42).

    The entry at index ``(f - pred_n) % L`` of a full deque maps to the frame
    at cycle step ``2·imaging_n − pred_n + 1 − L`` of the current cycle; when
    that offset is negative the bbox comes from the previous cycle's moving
    phase (except in cycle 0, whose deque is not yet full and resolves to the
    stationary imaging phase).
    """
    g_offset = 2 * params.imaging_n - params.pred_n + 1 - params.cycle_n
    if g_offset >= 0:
        pos = ctx.position  # current imaging phase — stationary
    else:
        prev = ctx.prev_positions[params.cycle_n + g_offset]
        pos = jnp.where(ctx.cycle == 0, ctx.position, prev)
    return jnp.stack([pos[0] - params.cam_w // 2, pos[1] - params.cam_h // 2])


def csv_controller(csv_data: np.ndarray, params: EngineParams) -> CycleController:
    """Ground-truth playback controller (engine twin of CsvController)."""
    consts = {"csv": jnp.asarray(csv_data, dtype=jnp.float64)}

    def decide(consts, state, ctx: DecideCtx):
        f = ctx.cycle * params.cycle_n + params.imaging_n
        bbox = _gather_rows(consts["csv"], f - params.pred_n)
        cam_tl = _decision_cam_topleft(params, ctx)

        # match host arithmetic order: shift into camera coords, then center
        rel_xy = bbox[:2] - cam_tl
        center = rel_xy + bbox[2:] / 2
        target = center - jnp.array([params.cam_w / 2, params.cam_h / 2])

        valid = jnp.isfinite(bbox).all()
        dxdy = jnp.where(valid, jnp.round(target), 0.0).astype(jnp.int32)
        return state, dxdy

    return CycleController(
        init=lambda: (),
        decide=decide,
        predict_all=_csv_predict_all(params),
        consts=consts,
        cache_key=("csv",),
    )


def optimal_controller(csv_data: np.ndarray, params: EngineParams) -> CycleController:
    """Oracle controller (engine twin of OptimalController)."""
    csv = jnp.asarray(csv_data, dtype=jnp.float64)
    consts = {"csv": csv, "centers": csv[:, :2] + csv[:, 2:] / 2}

    def decide(consts, state, ctx: DecideCtx):
        start = (ctx.cycle + 1) * params.cycle_n
        nxt = _gather_rows(consts["centers"], start + jnp.arange(params.imaging_n))  # (im, 2)
        med = jnp.nanmedian(nxt, axis=0)

        cam_mid = jnp.array(
            [
                ctx.position[0] - params.cam_w // 2 + params.cam_w / 2,
                ctx.position[1] - params.cam_h // 2 + params.cam_h / 2,
            ]
        )
        target = med - cam_mid
        valid = jnp.isfinite(med).all()
        dxdy = jnp.where(valid, jnp.round(target), 0.0).astype(jnp.int32)
        return state, dxdy

    return CycleController(
        init=lambda: (),
        decide=decide,
        predict_all=_csv_predict_all(params),
        consts=consts,
        cache_key=("optimal",),
    )


def polyfit_controller(
    csv_data: np.ndarray,
    params: EngineParams,
    sample_times: np.ndarray,
    fit_weights: np.ndarray,
    degree: int,
) -> CycleController:
    """Polynomial-extrapolation controller (engine twin of PolyfitController).

    Invalid samples are excluded with zero fit weights (shape-stable under
    jit); the fit runs through the TPU-safe eigh-based lstsq.
    """
    consts = {
        "csv": jnp.asarray(csv_data, dtype=jnp.float64),
        # runtime args, not traced constants — different sample grids/weights
        # (e.g. successive PSO candidates) reuse one compiled runner
        "times": jnp.asarray(np.sort(sample_times), dtype=jnp.float64),
        "fit_w": jnp.asarray(fit_weights, dtype=jnp.float64),
    }
    x_eval = float(params.cycle_n + params.imaging_n // 2)

    def decide(consts, state, ctx: DecideCtx):
        times, base_w = consts["times"], consts["fit_w"]
        idx = ctx.cycle * params.cycle_n + times.astype(jnp.int32)
        bboxes = _gather_rows(consts["csv"], idx)  # (k, 4) absolute

        cam_tl = jnp.stack(
            [ctx.position[0] - params.cam_w // 2, ctx.position[1] - params.cam_h // 2]
        ).astype(jnp.float64)
        rel = bboxes.at[:, :2].add(-cam_tl)
        pos = rel[:, :2] + rel[:, 2:] / 2  # centers, camera-relative

        mask = jnp.isfinite(pos).all(axis=1)
        w = jnp.where(mask, base_w, 0.0)
        y = jnp.where(mask[:, None], pos, 0.0)

        coeffs = polyfit(times, y, deg=degree, w=w)  # (deg+1, 2)
        pred = jnp.sum(polyvander(jnp.float64(x_eval), degree)[..., None] * coeffs, axis=0)

        target = pred - jnp.array([params.cam_w / 2, params.cam_h / 2])
        valid = mask.any()
        dxdy = jnp.where(valid, jnp.round(target), 0.0).astype(jnp.int32)
        return state, dxdy

    return CycleController(
        init=lambda: (),
        decide=decide,
        predict_all=_csv_predict_all(params),
        consts=consts,
        cache_key=("polyfit", degree),
    )


def mlp_controller(
    csv_data: np.ndarray,
    params: EngineParams,
    predictor,
    max_speed_px_frame_total: float,
) -> CycleController:
    """Neural controller (engine twin of MLPController).

    Args:
        predictor: a :class:`~wtracker_tpu.models.resmlp.WormPredictor`.
        max_speed_px_frame_total: clip bound in px (max speed × first pred
            offset), mirroring mlp_controllers.py:32-34.
    """
    io = predictor.io_config
    model = predictor.model
    consts = {
        "csv": jnp.asarray(csv_data, dtype=jnp.float64),
        "mlp": predictor.variables,
        "input_frames": jnp.asarray(io.input_frames, dtype=jnp.int32),
        "max_speed": jnp.float32(max_speed_px_frame_total),
    }

    def decide(consts, state, ctx: DecideCtx):
        f = ctx.cycle * params.cycle_n + params.imaging_n
        idx = (f - params.pred_n) + consts["input_frames"]
        bboxes = _gather_rows(consts["csv"], idx)  # (k, 4) absolute

        cam_center = jnp.array(
            [
                (ctx.position[0] - params.cam_w // 2) + params.cam_w / 2,
                (ctx.position[1] - params.cam_h // 2) + params.cam_h / 2,
            ]
        )
        valid = jnp.isfinite(bboxes).all()

        rel = bboxes[0, :2] - cam_center
        origin = bboxes[0, :2]
        feats = bboxes.at[:, :2].add(-origin).reshape(1, -1)
        feats = jnp.where(valid, feats, 0.0)  # keep the network NaN-free

        pred = model.apply(consts["mlp"], feats.astype(jnp.float32), train=False)
        # clip in f32 (host clips the f32 model output before widening)
        pred = jnp.clip(pred.reshape(-1), -consts["max_speed"], consts["max_speed"])
        pred = pred.astype(jnp.float64)

        target = pred[:2] + rel
        dxdy = jnp.where(valid, jnp.round(target), 0.0).astype(jnp.int32)
        return state, dxdy

    return CycleController(
        init=lambda: (),
        decide=decide,
        predict_all=_csv_predict_all(params),
        consts=consts,
        # repr captures the full static architecture; apply() is pure given
        # the variables, so equal-architecture predictors share the runner
        cache_key=("mlp", repr(model), tuple(io.input_frames)),
    )


# ---------------------------------------------------------------------------
# stream-batched playback controllers (multi-experiment sweeps)
# ---------------------------------------------------------------------------


def csv_controller_streams(csv_data: np.ndarray, params: EngineParams) -> CycleController:
    """Stream-batched ground-truth playback: ``csv_data`` is (S, N, 4).

    For ``run_engine_streams(..., batched_controller=True)`` — the vmap-free
    form of S parallel CsvController experiments (the reference runs these
    serially, one notebook execution per experiment).
    """
    consts = {"csv": jnp.asarray(csv_data, dtype=jnp.float64)}

    def gather(csv, idx):
        n = csv.shape[1]
        valid = (idx >= 0) & (idx < n)
        rows = jnp.take(csv, jnp.clip(idx, 0, n - 1), axis=1)
        return jnp.where(valid[..., None], rows, jnp.nan)

    def decide(consts, state, ctx: DecideCtx):
        f = ctx.cycle * params.cycle_n + params.imaging_n
        bbox = gather(consts["csv"], jnp.full((1,), f - params.pred_n))[:, 0]  # (S, 4)
        cam_tl = (ctx.position - jnp.array([params.cam_w // 2, params.cam_h // 2])).astype(jnp.float64)
        rel_xy = bbox[:, :2] - cam_tl
        center = rel_xy + bbox[:, 2:] / 2
        target = center - jnp.array([params.cam_w / 2, params.cam_h / 2])
        valid = jnp.isfinite(bbox).all(axis=1)
        return state, jnp.where(valid[:, None], jnp.round(target), 0.0).astype(jnp.int32)

    def predict_all(consts, state, cycle_idx, positions):
        idx = cycle_idx * params.cycle_n + jnp.arange(params.cycle_n)
        rows = gather(consts["csv"], idx)  # (S, L, 4)
        cam_tl = (
            positions - jnp.array([params.cam_w // 2, params.cam_h // 2], dtype=positions.dtype)
        ).astype(jnp.float64)
        rel = jax.lax.optimization_barrier(rows[..., :2] - cam_tl)
        return jnp.concatenate([rel + cam_tl, rows[..., 2:]], axis=-1)

    return CycleController(
        init=lambda: (), decide=decide, predict_all=predict_all, consts=consts, cache_key=("csv_streams",)
    )

"""Live-detection closed loop: YOLO → ResMLP inside the scan engine.

This is the flagship path of the framework (BASELINE.json: "Full closed-loop
Simulator: YOLO controller on one microscopy video stream", scaled out to many
streams).  Each scan step simulates one cycle of the real platform:

1. render (or crop) the imaging-phase camera views;
2. detect the worm head in every view with the Flax YOLOv8 (batched across
   streams × frames — one MXU-friendly batch per cycle);
3. append detections (absolute coordinates) to a per-stream ring buffer;
4. predict the worm's future displacement with the ResMLP from the ring
   history at the predictor's ``input_frames`` offsets (the reference
   MLPController math, mlp_controllers.py:38-68) — falling back to the
   detected-position move (CsvController math) when history is incomplete;
5. spread the move over the moving phase with the sine motor;
6. (log mode) detect the moving-phase views too, so the emitted log rows carry
   a worm bbox for every frame like the reference's YoloController
   ``_cycle_predict_all`` (yolo_controller.py:108-109).

No image data is stored or transferred anywhere: views are rendered on device
by :class:`~wtracker_tpu.sim.synthetic.SyntheticScene` as a function of the
ground-truth trajectory and the platform position.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from wtracker_tpu.models.yolov8 import YoloV8, can_fold_stem, detect_top1, make_folded_detect
from wtracker_tpu.sim.engine import CycleController, DecideCtx, EngineParams
from wtracker_tpu.sim.synthetic import SyntheticScene


def _resolve_detect(detect_fn, config: LiveLoopConfig, detector_model, detector_variables, view_hw):
    """Pick the cycle's detect function: explicit hook > folded stem > standard.

    The folded-stem fast path applies only to the built-in bf16 detector
    (an explicit ``detect_fn`` — e.g. the int8 serving path — handles its own
    preprocessing).
    """
    if detect_fn is not None:
        return detect_fn
    if config.fold_stem is False:
        return detect_top1
    folded = None
    if can_fold_stem(detector_variables):
        folded = make_folded_detect(detector_model, view_hw, config.imgsz)
    if folded is None:
        if config.fold_stem:
            raise ValueError(
                "fold_stem=True needs BN-fused detector variables and a "
                f"padding-free letterbox, got camera {view_hw} -> imgsz {config.imgsz}"
            )
        return detect_top1
    return folded


@dataclass(frozen=True)
class LiveLoopConfig:
    """Static settings of the live YOLO+MLP loop."""

    imgsz: tuple[int, int] = (416, 416)
    conf: float = 0.1
    ring_size: int = 64
    """Detection-history depth (must exceed the oldest MLP input offset plus
    one cycle)."""
    log_mode: bool = True
    """Also detect moving-phase frames so every log row has a worm bbox."""
    max_dist_per_pred: float = 40.0
    """Clip bound on the MLP displacement prediction, in px."""
    use_pallas_preproc: bool | None = None
    """Video path only: fuse crop+resize+normalize into the Pallas kernel
    (double-buffered DMA pipeline; measured 3-16x faster than the unfused
    crop+letterbox across 15-1440 view batches, bit-exact — see
    docs/performance.md round 3). ``None`` (default) = auto: ON whenever the
    backend is TPU and the camera/imgsz are square; ``True``/``False``
    force it (True still requires square shapes)."""
    detect_chunks: int = 1
    """Split each cycle's flat render+detect batch into this many sequential
    sub-batches. ~360 views per sub-batch measures ~8% faster end-to-end than
    one flat S·cycle_n batch (7,415 vs 6,839 img/s detector throughput;
    5,531 vs 5,135 steps/s in the loop). 1 = single batch."""
    detect_unroll: bool = False
    """Unroll the sub-batch loop in Python instead of ``lax.scan``
    (``lax.map``). Inside a rolled loop XLA assigns the detector's conv
    activations batch-minor layouts and inserts fix-up copies (device trace,
    docs/performance.md round 3); unrolling lets it pick conv-friendly
    layouts at the cost of a ~``detect_chunks``× larger program to compile."""
    fold_stem: bool | None = None
    """Compute the detector's stem conv as part of the letterbox matmuls
    (:func:`wtracker_tpu.models.yolov8.make_folded_detect`) — the stem's
    3-channel conv has no good TPU layout and was 22% of the whole cycle in
    the round-3 device trace. ``None`` (default) = auto: ON whenever the
    detector variables are BN-fused and the camera→imgsz letterbox has no
    padding; ``True`` raises if the geometry can't fold; ``False`` forces the
    standard letterbox→conv path. Exact math (f32 maxdiff ~1e-6), so the
    default flips on everywhere it applies."""


def _batched_move_from_history(
    mlp_model, mlp_vars, feats_abs, last_det, cam_center, max_dist
):
    """Shared (S,·) movement decision: MLP on relative bbox history, falling
    back to centering the freshest detection, else staying put.

    ``feats_abs`` is the (S, k, 4) absolute-coordinate bbox history at the
    predictor's ``input_frames`` offsets (newest first); ``last_det`` the
    (S, 4) kickoff-frame detection; ``cam_center`` the (S, 2) camera center.
    Mirrors the reference MLPController math (mlp_controllers.py:38-68) with
    the CsvController fallback; used by both the fused cycle controller and
    the standalone decision step so the two can't drift apart.
    """
    S = feats_abs.shape[0]
    mlp_valid = jnp.isfinite(feats_abs).all(axis=(1, 2))

    rel = feats_abs[:, 0, :2] - cam_center
    origin = feats_abs[:, 0:1, :2]
    feats = (feats_abs.at[:, :, :2].add(-origin)).reshape(S, -1)
    feats = jnp.where(mlp_valid[:, None], feats, 0.0)

    pred = mlp_model.apply(mlp_vars, feats.astype(jnp.float32), train=False)
    pred = jnp.clip(pred, -max_dist, max_dist)
    mlp_move = jnp.round(pred[:, :2] + rel)

    det_valid = jnp.isfinite(last_det).all(axis=1)
    det_center = last_det[:, :2] + last_det[:, 2:] / 2
    det_move = jnp.round(det_center - cam_center)

    return jnp.where(
        mlp_valid[:, None],
        mlp_move,
        jnp.where(det_valid[:, None], det_move, jnp.zeros((S, 2))),
    ).astype(jnp.int32)


def make_decision_step(
    config: LiveLoopConfig,
    detector_model: YoloV8,
    detector_variables: dict,
    predictor,
    view_hw: tuple[int, int],
    detect_fn=None,
):
    """The deployment decision, standalone: detect the predictor's input
    frames, assemble relative features, run the MLP, emit the platform move.

    This is exactly the work the real instrument must finish inside
    ``pred_time_ms`` between the imaging-phase end and the movement start
    (the reference models that deadline with ``begin_movement_prediction``,
    /root/reference/wtracker/sim/simulator.py:173-180 and sim/config.py:46-48;
    its MLPController runs YOLO over the ``input_frames`` offsets + the MLP at
    decision time, sim_controllers/mlp_controllers.py). bench.py device-traces
    this function at S=1/S=4 for the published ``latency_ms``.

    Returns ``decide(det_vars, mlp_vars, views, cam_tl) -> (S, 2) int32`` —
    jit-ready; ``views`` is the (S, k, H, W) stack of camera frames at the
    ``input_frames`` offsets (newest first, uint8 or float), ``cam_tl`` the
    (S, 2) float camera top-left in arena coordinates.
    """
    _detect = _resolve_detect(detect_fn, config, detector_model, detector_variables, view_hw)
    io = predictor.io_config
    k = len(io.input_frames)
    mlp_model = predictor.model
    H, W = view_hw

    def decide(det_vars, mlp_vars, views, cam_tl):
        S = views.shape[0]
        flat = views.reshape(S * k, H, W)
        boxes = _detect(detector_model, det_vars, flat, config.imgsz, config.conf)
        tls = jnp.repeat(cam_tl, k, axis=0).astype(boxes.dtype)
        feats_abs = boxes.at[:, :2].add(tls).reshape(S, k, 4).astype(jnp.float32)
        cam_center = cam_tl.astype(jnp.float32) + jnp.array([W / 2, H / 2], jnp.float32)
        return _batched_move_from_history(
            mlp_model, mlp_vars, feats_abs, feats_abs[:, 0, :],
            cam_center, config.max_dist_per_pred,
        )

    return decide


def hybrid_yolo_mlp_controller(
    params: EngineParams,
    config: LiveLoopConfig,
    scene: SyntheticScene,
    gt_traj: np.ndarray,
    detector_model: YoloV8,
    detector_variables: dict,
    predictor,
    detect_fn=None,
) -> CycleController:
    """Build the live controller for one stream (vmap-ready via state).

    Args:
        gt_traj: (F, 2) ground-truth worm trajectory for the rendered scene —
            per-stream when used with ``run_engine_streams`` (state carries it).
        predictor: a :class:`~wtracker_tpu.models.resmlp.WormPredictor`; its
            ``input_frames`` offsets select ring entries as features.
    """
    _detect = _resolve_detect(detect_fn, config, detector_model, detector_variables, (params.cam_h, params.cam_w))
    R = config.ring_size
    L = params.cycle_n
    io = predictor.io_config
    input_frames = jnp.asarray(io.input_frames, dtype=jnp.int32)
    mlp_model = predictor.model
    gt = jnp.asarray(gt_traj, dtype=jnp.float32)

    cam_half = jnp.array([params.cam_w // 2, params.cam_h // 2], dtype=jnp.int32)
    view_hw = (params.cam_h, params.cam_w)

    # model weights ride in consts — jit arguments, never closure constants
    consts = {"det": detector_variables, "mlp": predictor.variables}

    def detect_views(consts, worm_xy, cam_tls, frame_idx):
        views = scene.render_views(worm_xy, cam_tls.astype(jnp.float32), view_hw, frame_idx)
        boxes = _detect(detector_model, consts["det"], views, config.imgsz, config.conf)
        # view -> absolute arena coordinates
        return boxes.at[:, :2].add(cam_tls.astype(boxes.dtype))

    def init():
        return {
            "ring": jnp.full((R, 4), jnp.nan, dtype=jnp.float32),
            "stash": jnp.full((params.imaging_n, 4), jnp.nan, dtype=jnp.float32),
            "gt": gt,
        }

    def decide(consts, state, ctx: DecideCtx):
        idx = ctx.cycle * L + jnp.arange(params.imaging_n)
        cam_tl = ctx.position - cam_half
        cam_tls = jnp.broadcast_to(cam_tl, (params.imaging_n, 2))

        worm_xy = jnp.take(state["gt"], jnp.clip(idx, 0, state["gt"].shape[0] - 1), axis=0)
        boxes_abs = detect_views(consts, worm_xy, cam_tls, idx)

        ring = state["ring"].at[idx % R, :].set(boxes_abs)

        # --- movement prediction (reference MLPController math) ---
        kickoff = ctx.cycle * L + params.imaging_n - params.pred_n
        f_in = kickoff + input_frames
        feats_abs = jnp.where(
            (f_in >= 0)[:, None], jnp.take(ring, f_in % R, axis=0), jnp.nan
        )  # (k, 4) absolute

        cam_center = (cam_tl.astype(jnp.float32) + jnp.array(
            [params.cam_w / 2, params.cam_h / 2], jnp.float32
        ))
        mlp_valid = jnp.isfinite(feats_abs).all()

        rel = feats_abs[0, :2] - cam_center
        origin = feats_abs[0, :2]
        feats = feats_abs.at[:, :2].add(-origin).reshape(1, -1)
        feats = jnp.where(mlp_valid, feats, 0.0)

        pred = mlp_model.apply(consts["mlp"], feats.astype(jnp.float32), train=False).reshape(-1)
        pred = jnp.clip(pred, -config.max_dist_per_pred, config.max_dist_per_pred)
        mlp_move = jnp.round(pred[:2] + rel)

        # fallback: center the freshest detection (CsvController math)
        last_det = jnp.take(ring, (kickoff % R) * jnp.ones((), jnp.int32), axis=0).reshape(4)
        det_valid = jnp.isfinite(last_det).all()
        det_center = last_det[:2] + last_det[2:] / 2
        det_move = jnp.round(det_center - cam_center)

        dxdy = jnp.where(
            mlp_valid, mlp_move, jnp.where(det_valid, det_move, jnp.zeros(2))
        ).astype(jnp.int32)

        state = {"ring": ring, "stash": boxes_abs, "gt": state["gt"]}
        return state, dxdy

    def predict_all(consts, state, cycle_idx, positions):
        imaging = state["stash"].astype(jnp.float64)
        if not config.log_mode:
            moving = jnp.full((params.moving_n, 4), jnp.nan, dtype=jnp.float64)
        else:
            idx = cycle_idx * L + params.imaging_n + jnp.arange(params.moving_n)
            cam_tls = positions[params.imaging_n :] - cam_half
            worm_xy = jnp.take(state["gt"], jnp.clip(idx, 0, state["gt"].shape[0] - 1), axis=0)
            moving = detect_views(consts, worm_xy, cam_tls, idx).astype(jnp.float64)
        return jnp.concatenate([imaging, moving], axis=0)

    return CycleController(
        init=init,
        decide=decide,
        predict_all=predict_all,
        consts=consts,
        cache_key=("live", detect_fn, config, scene, repr(detector_model), repr(mlp_model), tuple(io.input_frames)),
    )


def make_stream_batch(
    params: EngineParams,
    config: LiveLoopConfig,
    scene: SyntheticScene,
    gt_trajs: np.ndarray,
    detector_model: YoloV8,
    detector_variables: dict,
    predictor,
    detect_fn=None,
) -> CycleController:
    """Controller whose state carries per-stream trajectories, for
    :func:`~wtracker_tpu.sim.engine.run_engine_streams`.

    Args:
        gt_trajs: (S, F, 2) per-stream ground-truth trajectories.
    """
    base = hybrid_yolo_mlp_controller(
        params, config, scene, gt_trajs[0], detector_model, detector_variables, predictor,
        detect_fn=detect_fn,
    )
    S = gt_trajs.shape[0]
    # device-resident ONCE at build time: a fresh jnp.asarray inside init()
    # would re-upload the (S, F, 2) table through the tunnel on every
    # run_engine_streams call (46 MB ~ 0.5 s/window at bench scale)
    gt0 = jnp.asarray(gt_trajs, dtype=jnp.float32)
    R = config.ring_size

    def init():
        return {
            "ring": jnp.full((S, R, 4), jnp.nan, dtype=jnp.float32),
            "stash": jnp.full((S, params.imaging_n, 4), jnp.nan, dtype=jnp.float32),
            "gt": gt0,
        }

    return CycleController(
        init=init,
        decide=base.decide,
        predict_all=base.predict_all,
        consts=base.consts,
        cache_key=("live-streams",) + base.cache_key[1:],
    )


def make_stream_batch_flat(
    params: EngineParams,
    config: LiveLoopConfig,
    scene: SyntheticScene,
    gt_trajs: np.ndarray,
    detector_model: YoloV8,
    detector_variables: dict,
    predictor,
    detect_fn=None,
) -> CycleController:
    """Batched-controller variant: one flat S·frames detection batch per phase.

    For ``run_engine_streams(..., batched_controller=True)``: decide and
    predict_all own the stream axis, so the detector sees (S·imaging_n, h, w)
    batches — bigger MXU matmuls than vmap-of-streams produces (~1.6× faster
    at S=24).  Semantics identical to :func:`make_stream_batch`.
    """
    S = gt_trajs.shape[0]
    # device-resident ONCE at build time: a fresh jnp.asarray inside init()
    # would re-upload the (S, F, 2) table through the tunnel on every
    # run_engine_streams call (46 MB ~ 0.5 s/window at bench scale)
    gt0 = jnp.asarray(gt_trajs, dtype=jnp.float32)
    _detect = _resolve_detect(detect_fn, config, detector_model, detector_variables, (params.cam_h, params.cam_w))
    R = config.ring_size
    L = params.cycle_n
    IM, MV = params.imaging_n, params.moving_n
    io = predictor.io_config
    input_frames = jnp.asarray(io.input_frames, dtype=jnp.int32)
    mlp_model = predictor.model

    cam_half = jnp.array([params.cam_w // 2, params.cam_h // 2], dtype=jnp.int32)
    view_hw = (params.cam_h, params.cam_w)
    consts = {"det": detector_variables, "mlp": predictor.variables}

    def _render_detect(consts, worm_xy, cam_tls, fidx):
        views = scene.render_views(worm_xy, cam_tls.astype(jnp.float32), view_hw, fidx)
        boxes = _detect(detector_model, consts["det"], views, config.imgsz, config.conf)
        return boxes.at[:, :2].add(cam_tls.astype(boxes.dtype))

    def detect_flat(consts, worm_xy_flat, cam_tls_flat, fidx_flat):
        n = worm_xy_flat.shape[0]
        k = config.detect_chunks
        if k <= 1 or n % k:
            return _render_detect(consts, worm_xy_flat, cam_tls_flat, fidx_flat)
        # sequential sub-batches: per-view math is independent, so results are
        # identical — but each sub-batch's activations fit HBM comfortably
        m = n // k
        if config.detect_unroll:
            # python-unrolled: inside a rolled lax.map XLA assigns the conv
            # activations batch-minor layouts + fix-up copies (trace, round 3)
            outs = [
                _render_detect(
                    consts,
                    worm_xy_flat[i * m : (i + 1) * m],
                    cam_tls_flat[i * m : (i + 1) * m],
                    fidx_flat[i * m : (i + 1) * m],
                )
                for i in range(k)
            ]
            return jnp.concatenate(outs, axis=0)
        out = jax.lax.map(
            lambda args: _render_detect(consts, *args),
            (worm_xy_flat.reshape(k, m, 2), cam_tls_flat.reshape(k, m, 2), fidx_flat.reshape(k, m)),
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
        idx = ctx.cycle * L + jnp.arange(IM)  # (IM,)
        safe = jnp.clip(idx, 0, gt.shape[1] - 1)
        worm_xy = gt[:, safe, :].reshape(S * IM, 2)

        cam_tl = ctx.position - cam_half  # (S, 2)
        cam_tls = jnp.repeat(cam_tl, IM, axis=0)
        fidx = jnp.tile(idx, S)

        boxes = detect_flat(consts, worm_xy, cam_tls, fidx).reshape(S, IM, 4)
        ring = state["ring"].at[:, idx % R, :].set(boxes)

        kickoff = ctx.cycle * L + IM - params.pred_n
        f_in = kickoff + input_frames  # (k,)
        feats_abs = jnp.where(
            (f_in >= 0)[None, :, None], ring[:, f_in % R, :], jnp.nan
        )  # (S, k, 4)

        cam_center = cam_tl.astype(jnp.float32) + jnp.array(
            [params.cam_w / 2, params.cam_h / 2], jnp.float32
        )
        dxdy = _batched_move_from_history(
            mlp_model, consts["mlp"], feats_abs, ring[:, kickoff % R, :],
            cam_center, config.max_dist_per_pred,
        )

        return {"ring": ring, "stash": boxes, "gt": gt}, dxdy

    def predict_all(consts, state, cycle_idx, positions):
        imaging = state["stash"].astype(jnp.float64)  # (S, IM, 4)
        if not config.log_mode:
            moving = jnp.full((S, MV, 4), jnp.nan, dtype=jnp.float64)
        else:
            gt = state["gt"]
            idx = cycle_idx * L + IM + jnp.arange(MV)
            safe = jnp.clip(idx, 0, gt.shape[1] - 1)
            worm_xy = gt[:, safe, :].reshape(S * MV, 2)
            cam_tls = (positions[:, IM:, :] - cam_half).reshape(S * MV, 2)
            fidx = jnp.tile(idx, S)
            moving = detect_flat(consts, worm_xy, cam_tls, fidx).reshape(S, MV, 4).astype(jnp.float64)
        return jnp.concatenate([imaging, moving], axis=1)

    return CycleController(
        init=init,
        decide=decide,
        predict_all=predict_all,
        consts=consts,
        # S is baked into the traced reshapes — it must key the runner
        cache_key=("live-flat", detect_fn, S, config, scene, repr(detector_model), repr(mlp_model), tuple(io.input_frames)),
    )


def make_stream_batch_fused(
    params: EngineParams,
    config: LiveLoopConfig,
    scene: SyntheticScene,
    gt_trajs: np.ndarray,
    detector_model: YoloV8,
    detector_variables: dict,
    predictor,
    detect_fn=None,
) -> CycleController:
    """One detector graph per cycle: moving(C−1) + imaging(C) in a single batch.

    For ``run_engine_streams(..., delayed_log=True)``.  Per scan step the
    detector sees one flat (S·cycle_n, h, w) batch — the previous cycle's
    moving-phase views (positions known from the carry) plus the current
    imaging phase.  Log rows are emitted with a one-cycle delay; detection
    results are identical to :func:`make_stream_batch_flat` (equivalence is
    tested), but there is a single conv pipeline in the loop body, which
    halves compile time and improves MXU utilization on the small moving
    batch.
    """
    S = gt_trajs.shape[0]
    # device-resident ONCE at build time: a fresh jnp.asarray inside init()
    # would re-upload the (S, F, 2) table through the tunnel on every
    # run_engine_streams call (46 MB ~ 0.5 s/window at bench scale)
    gt0 = jnp.asarray(gt_trajs, dtype=jnp.float32)
    _detect = _resolve_detect(detect_fn, config, detector_model, detector_variables, (params.cam_h, params.cam_w))
    R = config.ring_size
    L = params.cycle_n
    IM, MV = params.imaging_n, params.moving_n
    io = predictor.io_config
    input_frames = jnp.asarray(io.input_frames, dtype=jnp.int32)
    mlp_model = predictor.model

    cam_half = jnp.array([params.cam_w // 2, params.cam_h // 2], dtype=jnp.int32)
    view_hw = (params.cam_h, params.cam_w)
    consts = {"det": detector_variables, "mlp": predictor.variables}

    def _render_detect(consts, worm_xy, cam_tls, fidx):
        views = scene.render_views(worm_xy, cam_tls.astype(jnp.float32), view_hw, fidx)
        boxes = _detect(detector_model, consts["det"], views, config.imgsz, config.conf)
        return boxes.at[:, :2].add(cam_tls.astype(boxes.dtype))

    def detect_flat(consts, worm_xy_flat, cam_tls_flat, fidx_flat):
        n = worm_xy_flat.shape[0]
        k = config.detect_chunks
        if k <= 1 or n % k:
            return _render_detect(consts, worm_xy_flat, cam_tls_flat, fidx_flat)
        # sequential sub-batches: per-view math is independent, so results are
        # identical — but each sub-batch's activations fit HBM comfortably
        m = n // k
        if config.detect_unroll:
            # python-unrolled: inside a rolled lax.map XLA assigns the conv
            # activations batch-minor layouts + fix-up copies (trace, round 3)
            outs = [
                _render_detect(
                    consts,
                    worm_xy_flat[i * m : (i + 1) * m],
                    cam_tls_flat[i * m : (i + 1) * m],
                    fidx_flat[i * m : (i + 1) * m],
                )
                for i in range(k)
            ]
            return jnp.concatenate(outs, axis=0)
        out = jax.lax.map(
            lambda args: _render_detect(consts, *args),
            (worm_xy_flat.reshape(k, m, 2), cam_tls_flat.reshape(k, m, 2), fidx_flat.reshape(k, m)),
        )
        return out.reshape(n, 4)

    def init():
        return {
            "ring": jnp.full((S, R, 4), jnp.nan, dtype=jnp.float32),
            "log_rows": jnp.full((S, L, 4), jnp.nan, dtype=jnp.float32),
            "img_stash": jnp.full((S, IM, 4), jnp.nan, dtype=jnp.float32),
            "gt": gt0,
        }

    def decide(consts, state, ctx: DecideCtx):
        gt = state["gt"]
        F = gt.shape[1]

        # frame indices: previous cycle's moving phase + current imaging phase
        mov_idx = (ctx.cycle - 1) * L + IM + jnp.arange(MV)  # (MV,) may be <0 at C=0
        img_idx = ctx.cycle * L + jnp.arange(IM)

        mov_tls = ctx.prev_positions[:, IM:, :] - cam_half  # (S, MV, 2)
        img_tl = ctx.position - cam_half  # (S, 2)
        img_tls = jnp.repeat(img_tl, IM, axis=0)  # (S*IM, 2)

        idx_all = jnp.concatenate([jnp.tile(mov_idx, S), jnp.tile(img_idx, S)])
        safe_mov = jnp.clip(mov_idx, 0, F - 1)
        safe_img = jnp.clip(img_idx, 0, F - 1)
        worm_all = jnp.concatenate(
            [gt[:, safe_mov, :].reshape(S * MV, 2), gt[:, safe_img, :].reshape(S * IM, 2)]
        )
        tls_all = jnp.concatenate([mov_tls.reshape(S * MV, 2), img_tls])

        boxes = detect_flat(consts, worm_all, tls_all, idx_all)
        mov_boxes = boxes[: S * MV].reshape(S, MV, 4)
        img_boxes = boxes[S * MV :].reshape(S, IM, 4)

        # the just-completed cycle's log rows: its imaging stash + moving dets
        log_rows = jnp.concatenate([state["img_stash"], mov_boxes], axis=1)
        if not config.log_mode:
            log_rows = jnp.concatenate(
                [state["img_stash"], jnp.full((S, MV, 4), jnp.nan, jnp.float32)], axis=1
            )

        ring = state["ring"].at[:, img_idx % R, :].set(img_boxes)

        kickoff = ctx.cycle * L + IM - params.pred_n
        f_in = kickoff + input_frames
        feats_abs = jnp.where((f_in >= 0)[None, :, None], ring[:, f_in % R, :], jnp.nan)

        cam_center = img_tl.astype(jnp.float32) + jnp.array(
            [params.cam_w / 2, params.cam_h / 2], jnp.float32
        )
        dxdy = _batched_move_from_history(
            mlp_model, consts["mlp"], feats_abs, ring[:, kickoff % R, :],
            cam_center, config.max_dist_per_pred,
        )

        state = {"ring": ring, "log_rows": log_rows, "img_stash": img_boxes, "gt": gt}
        return state, dxdy

    def predict_all(consts, state, cycle_idx, prev_positions):
        return state["log_rows"].astype(jnp.float64)

    return CycleController(
        init=init,
        decide=decide,
        predict_all=predict_all,
        consts=consts,
        cache_key=("live-fused", detect_fn, S, config, scene, repr(detector_model), repr(mlp_model), tuple(io.input_frames)),
    )

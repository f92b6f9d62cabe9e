"""Live YOLO+MLP closed loop over real video frames (chunked device residency).

The renderer-based loop (:mod:`wtracker_tpu.sim.engine_live`) needs no pixels;
this module runs the same control loop over an actual recording.  Full
experiments (60k frames at 1400×1600) don't fit in HBM, so frames stream
through in fixed-size chunks:

* a chunk of decoded frames lives on device as a ``consts`` entry (a jit
  argument — chunks swap without recompiling);
* camera views are dynamic-slice crops (:func:`wtracker_tpu.ops.image.crop_views`)
  batched per cycle and letterboxed into the detector;
* the host loop walks chunks using the engine's carry resume, so the whole run
  is a handful of identical compiled calls;
* frame decode for the next chunk happens on host (the native BMP loader,
  runtime/) while the device crunches the current one — JAX's async dispatch
  gives the overlap for free.

Platform positions are clamped to the frame bounds minus the camera half-size
so crops stay in-bounds (the reference pads the world instead; for detection
the replicate-padded border adds no information).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from wtracker_tpu.models.yolov8 import YoloV8, detect_top1
from wtracker_tpu.ops.image import crop_views
from wtracker_tpu.sim.engine import (
    CycleController,
    CycleLog,
    DecideCtx,
    EngineParams,
    init_carry,
    run_engine,
)
from wtracker_tpu.sim.engine_live import LiveLoopConfig, _resolve_detect

_SCRATCH: dict = {}


def _scratch_buffer(key, shape) -> np.ndarray:
    """Process-lifetime uint8 scratch, keyed by role+shape.

    First-touch page faults on fresh allocations cost more than the work the
    buffer holds on some hosts (~30 ms/MB measured on the bench VM); reusing
    streaming buffers across run_video_live calls pays that tax once per
    process. The pool stays bounded: keys embed the shape, and callers use a
    fixed small set of roles (ping/pong raw + padded canvases)."""
    buf = _SCRATCH.get(key)
    if buf is None:
        # evict same-role buffers of other shapes so geometry changes don't
        # accumulate dead gigabytes
        for k in [k for k in _SCRATCH if k[:2] == key[:2] and k != key]:
            del _SCRATCH[k]
        buf = np.empty(shape, np.uint8)
        buf[:] = 0  # fault the pages in now, outside any timed region
        _SCRATCH[key] = buf
    return buf


def video_live_controller(
    params: EngineParams,
    config: LiveLoopConfig,
    detector_model: YoloV8,
    detector_variables: dict,
    predictor,
    chunk_shape: tuple[int, int, int],
    detect_fn=None,
    detect_preprocessed_fn=None,
    roi_full_hw: tuple[int, int] | None = None,
) -> CycleController:
    """Single-stream live controller reading views from a resident frame chunk.

    ``consts`` carries ``{"det", "mlp", "frames" (C, H, W) uint8, "frame0"}``;
    swap ``frames``/``frame0`` per chunk via ``controller._replace(consts=...)``
    — shapes stay fixed, so the compiled runner is reused.

    ROI streaming (``roi_full_hw=(full_h, full_w)``): the resident chunk holds
    per-frame *windows* of the recording, not full frames — ``chunk_shape`` is
    the window chunk and consts gain ``"win_tl"`` (C, 2) int32, each window's
    arena-coordinate origin in (x, y) order.  Crops are positioned relative to
    their frame's window; a crop that a mispredicted window cannot contain is
    clamped in-window, and the host (:func:`run_video_live`) detects that from
    the logged positions and replays the chunk with corrected windows, so the
    final logs are identical to the full-frame path.

    ``detect_fn(model, variables, views, imgsz, conf)`` /
    ``detect_preprocessed_fn(model, variables, x, geometry, imgsz, conf)``
    swap the detector implementation (e.g. the int8 serving path,
    :func:`wtracker_tpu.models.yolov8_int8.make_detect_fns`). When only
    ``detect_fn`` is given, the fused Pallas preprocessing branch is disabled
    (it needs the preprocessed-input form).
    """
    R = config.ring_size
    L = params.cycle_n
    IM, MV = params.imaging_n, params.moving_n
    io = predictor.io_config
    input_frames = jnp.asarray(io.input_frames, dtype=jnp.int32)
    mlp_model = predictor.model

    cam_half = jnp.array([params.cam_w // 2, params.cam_h // 2], dtype=jnp.int32)
    view_hw = (params.cam_h, params.cam_w)
    C, H, W = chunk_shape
    # arena bounds for crop clamping: the full recording frame (ROI mode) or
    # the resident chunk itself (full-frame mode)
    FH, FW = roi_full_hw if roi_full_hw is not None else (H, W)
    roi = roi_full_hw is not None

    _detect = _resolve_detect(detect_fn, config, detector_model, detector_variables, view_hw)
    square = params.cam_w == params.cam_h and config.imgsz[0] == config.imgsz[1]
    if config.use_pallas_preproc is None:  # auto: Mosaic needs a real TPU
        from wtracker_tpu.ops.pallas_preproc import tpu_backend_available

        use_pallas = square and tpu_backend_available()
    else:
        use_pallas = config.use_pallas_preproc and square
    if getattr(_detect, "folds_preproc", False):
        # folded-stem detectors consume raw views (letterbox + stem conv are
        # one matmul chain) — the Pallas crop+letterbox branch is redundant
        # and would route around the fold
        use_pallas = False
    elif detect_fn is not None and detect_preprocessed_fn is None:
        use_pallas = False  # custom detector without a preprocessed-input form

    # the Pallas kernel DMAs tile-aligned windows: store the chunk pre-padded
    # (chunk_device_hw) so the per-call pad never runs on the hot path
    if use_pallas:
        from wtracker_tpu.ops.pallas_preproc import padded_chunk_hw

        PH, PW = padded_chunk_hw(params.cam_w, H, W)
    else:
        PH, PW = H, W

    consts = {
        "det": detector_variables,
        "mlp": predictor.variables,
        "frames": jnp.zeros((C, PH, PW), jnp.uint8),
        "frame0": jnp.int32(0),
    }
    if roi:
        consts["win_tl"] = jnp.zeros((C, 2), jnp.int32)

    def crop_and_detect(consts, frame_idx, cam_tls):
        """frame_idx (N,) absolute; cam_tls (N, 2) arena coords → (N, 4) abs."""
        local = jnp.clip(frame_idx - consts["frame0"], 0, C - 1)
        # clamp crops fully inside the (original) frame
        tls = jnp.stack(
            [jnp.clip(cam_tls[:, 0], 0, FW - params.cam_w), jnp.clip(cam_tls[:, 1], 0, FH - params.cam_h)],
            axis=1,
        )
        if roi:
            # window-relative crop origin; the in-window clamp keeps the slice
            # legal on a mispredicted window (the host replays such chunks)
            win_tl = jnp.take(consts["win_tl"], local, axis=0)
            crop_tls = jnp.clip(
                tls - win_tl, 0, jnp.array([W - params.cam_w, H - params.cam_h], jnp.int32)
            )
        else:
            crop_tls = tls
        if use_pallas:
            from wtracker_tpu.models.yolov8 import detect_top1_preprocessed, letterbox_params
            from wtracker_tpu.ops.pallas_preproc import crop_letterbox_views

            x = crop_letterbox_views(
                consts["frames"], local, crop_tls, params.cam_w, config.imgsz[0],
                out_dtype=detector_model.compute_dtype,
                orig_hw=(H, W),
            )
            geom = letterbox_params(view_hw, config.imgsz)  # (scale, nh, nw, pad_top, pad_left)
            _detect_pre = detect_preprocessed_fn or detect_top1_preprocessed
            boxes = _detect_pre(
                detector_model, consts["det"], x, (geom[0], geom[3], geom[4]), config.imgsz, config.conf
            )
        else:
            frames = jnp.take(consts["frames"], local, axis=0)  # (N, H, W)
            views = crop_views(frames, crop_tls, view_hw)
            boxes = _detect(detector_model, consts["det"], views, config.imgsz, config.conf)
        return boxes.at[:, :2].add(tls.astype(boxes.dtype))

    def init():
        return {
            "ring": jnp.full((R, 4), jnp.nan, dtype=jnp.float32),
            "stash": jnp.full((IM, 4), jnp.nan, dtype=jnp.float32),
        }

    def decide(consts, state, ctx: DecideCtx):
        idx = ctx.cycle * L + jnp.arange(IM)
        cam_tl = ctx.position - cam_half
        cam_tls = jnp.broadcast_to(cam_tl, (IM, 2))

        boxes_abs = crop_and_detect(consts, idx, cam_tls)
        ring = state["ring"].at[idx % R, :].set(boxes_abs)

        kickoff = ctx.cycle * L + IM - params.pred_n
        f_in = kickoff + input_frames
        feats_abs = jnp.where((f_in >= 0)[:, None], jnp.take(ring, f_in % R, axis=0), jnp.nan)

        cam_center = cam_tl.astype(jnp.float32) + jnp.array(
            [params.cam_w / 2, params.cam_h / 2], jnp.float32
        )
        mlp_valid = jnp.isfinite(feats_abs).all()

        rel = feats_abs[0, :2] - cam_center
        origin = feats_abs[0, :2]
        feats = feats_abs.at[:, :2].add(-origin).reshape(1, -1)
        feats = jnp.where(mlp_valid, feats, 0.0)

        pred = mlp_model.apply(consts["mlp"], feats.astype(jnp.float32), train=False).reshape(-1)
        pred = jnp.clip(pred, -config.max_dist_per_pred, config.max_dist_per_pred)
        mlp_move = jnp.round(pred[:2] + rel)

        last_det = ring[kickoff % R]
        det_valid = jnp.isfinite(last_det).all()
        det_center = last_det[:2] + last_det[2:] / 2
        det_move = jnp.round(det_center - cam_center)

        dxdy = jnp.where(
            mlp_valid, mlp_move, jnp.where(det_valid, det_move, jnp.zeros(2))
        ).astype(jnp.int32)

        return {"ring": ring, "stash": boxes_abs}, dxdy

    def predict_all(consts, state, cycle_idx, positions):
        imaging = state["stash"].astype(jnp.float64)
        if not config.log_mode:
            moving = jnp.full((MV, 4), jnp.nan, dtype=jnp.float64)
        else:
            idx = cycle_idx * L + IM + jnp.arange(MV)
            cam_tls = positions[IM:] - cam_half
            moving = crop_and_detect(consts, idx, cam_tls).astype(jnp.float64)
        return jnp.concatenate([imaging, moving], axis=0)

    return CycleController(
        init=init,
        decide=decide,
        predict_all=predict_all,
        consts=consts,
        # chunk_shape is baked into the crop indexing — part of the program
        cache_key=(
            "video", detect_fn, detect_preprocessed_fn, tuple(chunk_shape), roi_full_hw,
            config, repr(detector_model), repr(mlp_model), tuple(io.input_frames),
        ),
    )


def run_video_live(
    params: EngineParams,
    config: LiveLoopConfig,
    frame_source: Callable[[int, int], np.ndarray],
    num_frames: int,
    detector_model: YoloV8,
    detector_variables: dict,
    predictor,
    init_position: tuple[int, int],
    cycles_per_chunk: int = 64,
    detect_fn=None,
    detect_preprocessed_fn=None,
    window_source: Callable | None = None,
    roi_window: int | tuple[int, int] | None = None,
    roi_chunk_cycles: int = 8,
    roi_speed_cap: float = 25.0,
    roi_stats: dict | None = None,
) -> CycleLog:
    """Run the live loop over a whole recording, chunk by chunk.

    Args:
        frame_source: ``(start_frame, count) -> (count, H, W) uint8`` — e.g.
            ``lambda s, n: reader.read_batch(range(s, s + n))`` (BMP sources
            hit the native parallel decoder).
        num_frames: total frames of the experiment.
        cycles_per_chunk: chunk size in cycles (chunk memory =
            ``cycles_per_chunk · cycle_n · H · W`` bytes).
        detect_fn / detect_preprocessed_fn: alternate detector implementation
            (see :func:`video_live_controller`) — e.g. the int8 serving path.
        roi_window: ROI streaming — read/upload only a ``roi_window``-sized
            window per frame (int or ``(win_h, win_w)``) instead of the whole
            frame.  Window origins are speculated ahead of the scan by
            extrapolating the platform trajectory; a chunk whose window missed
            a crop is detected from the logged positions and replayed with
            corrected windows, so the result is IDENTICAL to the full-frame
            path.  Requires ``window_source``.
        window_source: ``(start_frame, count, top_lefts (N,2) xy, out=None) ->
            (count, win_h, win_w) uint8`` — e.g. a closure over
            :meth:`FrameReader.read_window_batch`.
        roi_chunk_cycles: ROI chunk size in cycles (short chunks keep the
            speculation lookahead — two chunks — tight).
        roi_speed_cap: speculation velocity cap, px/cycle per axis.
        roi_stats: optional dict that receives ROI counters
            (``chunks``, ``replays``).

    Returns stacked logs over all complete cycles.
    """
    if roi_window is not None:
        if window_source is None:
            raise ValueError("roi_window requires window_source")
        win_hw = (roi_window, roi_window) if isinstance(roi_window, int) else tuple(roi_window)
        return _run_video_live_roi(
            params, config, frame_source, window_source, num_frames, detector_model,
            detector_variables, predictor, init_position, win_hw, roi_chunk_cycles,
            roi_speed_cap, detect_fn, detect_preprocessed_fn, roi_stats,
        )
    L = params.cycle_n
    n_cycles = params.n_logged_cycles(num_frames)
    chunk_frames = cycles_per_chunk * L

    probe = frame_source(0, 1)
    H, W = probe.shape[1:3]
    controller = video_live_controller(
        params, config, detector_model, detector_variables, predictor, (chunk_frames, H, W),
        detect_fn=detect_fn, detect_preprocessed_fn=detect_preprocessed_fn,
    )

    import inspect
    import threading

    carry = init_carry(params, controller, init_position)
    logs_parts = []

    # the controller's resident chunk may carry tile-alignment padding for the
    # Pallas preprocessing kernel — match its device shape on every upload
    PC, PH, PW = controller.consts["frames"].shape

    # streaming decode targets are PERSISTENT ping-pong buffers (module-level
    # pool): fresh-allocation page faults cost more than the decode itself on
    # some hosts (measured ~30 ms/MB first-touch on the bench VM — see
    # docs/performance.md round 4), so the hot loop never allocates.
    # frame_source may accept an optional third `out` argument to decode
    # straight into the buffer (FrameReader.read_batch does).
    try:
        accepts_out = len(inspect.signature(frame_source).parameters) >= 3
    except (TypeError, ValueError):
        accepts_out = False
    raw_bufs = [
        _scratch_buffer(("video-raw", i, PC, H, W), (PC, H, W)) for i in range(2)
    ]
    canvases = [None, None]
    if (PH, PW) != (H, W):
        canvases = [
            _scratch_buffer(("video-canvas", i, PC, PH, PW), (PC, PH, PW)) for i in range(2)
        ]
        for c in canvases:
            c[:] = 0

    def _fetch(start: int, count: int, buf: np.ndarray, canvas) -> np.ndarray:
        if accepts_out:
            frames = frame_source(start, count, buf[:count])
        else:
            frames = frame_source(start, count)
        if canvas is not None:
            canvas[:count, :H, :W] = frames
            if count < PC:
                canvas[count:] = 0
            return canvas
        if count < PC:  # tail chunk: stale rows are never indexed, but be safe
            buf[:count] = frames
            buf[count:] = 0
            return buf
        return frames if frames.shape == (PC, H, W) else np.ascontiguousarray(frames)

    pending: dict = {}

    def _prefetch(start: int, count: int, slot: int) -> threading.Thread:
        def worker():
            try:
                pending["frames"] = _fetch(start, count, raw_bufs[slot], canvases[slot])
            except BaseException as e:  # re-raised on join by the consumer
                pending["error"] = e

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        return t

    thread = _prefetch(0, min(chunk_frames, num_frames), 0)

    for i, start_cycle in enumerate(range(0, n_cycles, cycles_per_chunk)):
        n = min(cycles_per_chunk, n_cycles - start_cycle)
        thread.join()
        if "error" in pending:
            raise pending["error"]
        frames = pending.pop("frames")

        # kick off the next chunk's read+decode into the OTHER buffer BEFORE
        # this chunk's upload + device scan — decode (C++ loader / cv2) and
        # the device transfer both release the GIL, so the stages overlap
        # even on a single-core host (tools/bench_video.py measures this)
        nxt = (start_cycle + cycles_per_chunk) * L
        if nxt < n_cycles * L:
            thread = _prefetch(nxt, min(chunk_frames, num_frames - nxt), (i + 1) % 2)

        ctl = controller._replace(
            consts={**controller.consts, "frames": jnp.asarray(frames), "frame0": jnp.int32(start_cycle * L)}
        )
        logs, carry = run_engine(
            params, ctl, init_position, n, start_cycle=start_cycle, carry=carry, return_carry=True
        )
        logs_parts.append(logs)

    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *logs_parts)


def video_stream_controller(
    params: EngineParams,
    config: LiveLoopConfig,
    detector_model: YoloV8,
    detector_variables: dict,
    predictor,
    chunk_shape: tuple[int, int, int, int],
    detect_fn=None,
) -> CycleController:
    """Stream-batched live controller over S resident recording chunks.

    The multi-chip form of :func:`video_live_controller`: ``consts["frames"]``
    is (S, C, H, W) — one chunk per recording — and decide/predict_all own the
    stream axis (for ``run_engine_streams(..., batched_controller=True)`` /
    :func:`wtracker_tpu.parallel.run_engine_sharded`), so each cycle's crops
    form one flat (S·n, cam_h, cam_w) detector batch and the stream axis
    shards across the mesh with zero collectives in the scan (frames, rings
    and positions are all per-stream).

    This is how a pod eats the reference's hours-long per-recording workload
    (/root/reference/workflows/initialize_experiment.ipynb cell 11): S
    recordings tracked simultaneously, each chip holding S/n_devices streams'
    chunks.  ROI streaming and the Pallas preprocessing fusion are host-side /
    single-chip IO optimizations orthogonal to this axis and are not applied
    here (full-frame chunks shard).
    """
    R = config.ring_size
    L = params.cycle_n
    IM, MV = params.imaging_n, params.moving_n
    io = predictor.io_config
    input_frames = jnp.asarray(io.input_frames, dtype=jnp.int32)
    mlp_model = predictor.model

    cam_half = jnp.array([params.cam_w // 2, params.cam_h // 2], dtype=jnp.int32)
    view_hw = (params.cam_h, params.cam_w)
    S, C, H, W = chunk_shape

    _detect = _resolve_detect(detect_fn, config, detector_model, detector_variables, view_hw)

    consts = {
        "det": detector_variables,
        "mlp": predictor.variables,
        "frames": jnp.zeros((S, C, H, W), jnp.uint8),
        "frame0": jnp.int32(0),
    }

    def _detect_views(consts, views):
        n = views.shape[0]
        k = config.detect_chunks
        if k <= 1 or n % k:
            return _detect(detector_model, consts["det"], views, config.imgsz, config.conf)
        m = n // k
        out = jax.lax.map(
            lambda v: _detect(detector_model, consts["det"], v, config.imgsz, config.conf),
            views.reshape(k, m, *views.shape[1:]),
        )
        return out.reshape(n, 4)

    def crop_and_detect(consts, frame_idx, cam_tls):
        """frame_idx (N,) absolute (shared across streams); cam_tls (S·N, 2)
        arena coords → (S·N, 4) absolute boxes."""
        local = jnp.clip(frame_idx - consts["frame0"], 0, C - 1)  # (N,)
        frames = jnp.take(consts["frames"], local, axis=1)  # (S, N, H, W)
        flat = frames.reshape(S * local.shape[0], H, W)
        tls = jnp.stack(
            [
                jnp.clip(cam_tls[:, 0], 0, W - params.cam_w),
                jnp.clip(cam_tls[:, 1], 0, H - params.cam_h),
            ],
            axis=1,
        )
        views = crop_views(flat, tls, view_hw)
        boxes = _detect_views(consts, views)
        return boxes.at[:, :2].add(tls.astype(boxes.dtype))

    def init():
        return {
            "ring": jnp.full((S, R, 4), jnp.nan, dtype=jnp.float32),
            "stash": jnp.full((S, IM, 4), jnp.nan, dtype=jnp.float32),
        }

    def decide(consts, state, ctx: DecideCtx):
        from wtracker_tpu.sim.engine_live import _batched_move_from_history

        idx = ctx.cycle * L + jnp.arange(IM)  # (IM,)
        cam_tl = ctx.position - cam_half  # (S, 2)
        cam_tls = jnp.repeat(cam_tl, IM, axis=0)  # (S·IM, 2)

        boxes = crop_and_detect(consts, idx, cam_tls).reshape(S, IM, 4)
        ring = state["ring"].at[:, idx % R, :].set(boxes)

        kickoff = ctx.cycle * L + IM - params.pred_n
        f_in = kickoff + input_frames
        feats_abs = jnp.where((f_in >= 0)[None, :, None], ring[:, f_in % R, :], jnp.nan)

        cam_center = cam_tl.astype(jnp.float32) + jnp.array(
            [params.cam_w / 2, params.cam_h / 2], jnp.float32
        )
        dxdy = _batched_move_from_history(
            mlp_model, consts["mlp"], feats_abs, ring[:, kickoff % R, :],
            cam_center, config.max_dist_per_pred,
        )
        return {"ring": ring, "stash": boxes}, dxdy

    def predict_all(consts, state, cycle_idx, positions):
        imaging = state["stash"].astype(jnp.float64)
        if not config.log_mode:
            moving = jnp.full((S, MV, 4), jnp.nan, dtype=jnp.float64)
        else:
            idx = cycle_idx * L + IM + jnp.arange(MV)
            cam_tls = (positions[:, IM:, :] - cam_half).reshape(S * MV, 2)
            moving = crop_and_detect(consts, idx, cam_tls).reshape(S, MV, 4).astype(jnp.float64)
        return jnp.concatenate([imaging, moving], axis=1)

    return CycleController(
        init=init,
        decide=decide,
        predict_all=predict_all,
        consts=consts,
        cache_key=(
            "video-streams", detect_fn, tuple(chunk_shape), config,
            repr(detector_model), repr(mlp_model), tuple(io.input_frames),
        ),
    )


def run_video_live_sharded(
    params: EngineParams,
    config: LiveLoopConfig,
    frame_sources: list,
    num_frames: int,
    detector_model: YoloV8,
    detector_variables: dict,
    predictor,
    init_positions,
    cycles_per_chunk: int = 64,
    mesh=None,
    detect_fn=None,
) -> CycleLog:
    """Track S recordings simultaneously, streams sharded across a mesh.

    Args:
        frame_sources: S callables ``(start_frame, count) -> (count, H, W)
            uint8`` — one per recording (all the same geometry/length).
        init_positions: (S, 2) initial platform centers.
        mesh: a 1-D ``jax.sharding.Mesh`` (axis "streams"); ``None`` runs the
            same batched program unsharded (single device).

    The host walks chunks exactly like :func:`run_video_live` — prefetch the
    next chunk (all S streams) while the device scans the current one, resume
    the scan from the returned carry — but the resident chunk is (S, C, H, W)
    and the scan is the stream-sharded SPMD program.  Logs come back with
    leading axes ``(n_cycles, S, cycle_n)``.
    """
    import threading

    from wtracker_tpu.sim.engine import run_engine_streams

    S = len(frame_sources)
    if np.asarray(init_positions).shape != (S, 2):
        raise ValueError(f"init_positions must be ({S}, 2)")
    L = params.cycle_n
    n_cycles = params.n_logged_cycles(num_frames)
    chunk_frames = cycles_per_chunk * L

    probe = frame_sources[0](0, 1)
    H, W = probe.shape[1:3]
    controller = video_stream_controller(
        params, config, detector_model, detector_variables, predictor,
        (S, chunk_frames, H, W), detect_fn=detect_fn,
    )

    bufs = [
        _scratch_buffer(("video-sharded", i, S, chunk_frames, H, W), (S, chunk_frames, H, W))
        for i in range(2)
    ]

    def _fetch(start: int, count: int, buf: np.ndarray) -> np.ndarray:
        for s, src in enumerate(frame_sources):
            buf[s, :count] = src(start, count)
        if count < chunk_frames:
            buf[:, count:] = 0
        return buf

    pending: dict = {}

    def _prefetch(start: int, count: int, slot: int) -> threading.Thread:
        def worker():
            try:
                pending["frames"] = _fetch(start, count, bufs[slot])
            except BaseException as e:
                pending["error"] = e

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        return t

    thread = _prefetch(0, min(chunk_frames, num_frames), 0)

    init_pos = np.asarray(init_positions, dtype=np.int32)
    carry = None
    logs_parts = []
    for i, start_cycle in enumerate(range(0, n_cycles, cycles_per_chunk)):
        n = min(cycles_per_chunk, n_cycles - start_cycle)
        thread.join()
        if "error" in pending:
            raise pending["error"]
        frames = pending.pop("frames")

        nxt = (start_cycle + cycles_per_chunk) * L
        if nxt < n_cycles * L:
            thread = _prefetch(nxt, min(chunk_frames, num_frames - nxt), (i + 1) % 2)

        ctl = controller._replace(
            consts={
                **controller.consts,
                "frames": jnp.asarray(frames),
                "frame0": jnp.int32(start_cycle * L),
            }
        )
        if mesh is not None:
            from wtracker_tpu.parallel import run_engine_sharded

            logs, carry = run_engine_sharded(
                params, ctl, init_pos, n, mesh=mesh, batched_controller=True,
                start_cycle=start_cycle, carry=carry, return_carry=True,
            )
        else:
            if carry is None:
                logs, carry = _sharded_fallback_run(params, ctl, init_pos, n, start_cycle, None)
            else:
                logs, carry = _sharded_fallback_run(params, ctl, init_pos, n, start_cycle, carry)
        logs_parts.append(logs)

    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *logs_parts)


def _sharded_fallback_run(params, ctl, init_pos, n, start_cycle, carry):
    """Single-device run of the batched video controller with carry resume
    (the mesh=None path of :func:`run_video_live_sharded`)."""
    from wtracker_tpu.sim.engine import _stream_runner, _clamp

    run = _stream_runner(params, ctl, batched_controller=True, delayed_log=False)
    if carry is None:
        pos0 = _clamp(jnp.asarray(init_pos, jnp.int32), params)
        prev0 = jnp.broadcast_to(pos0[:, None, :], (pos0.shape[0], params.cycle_n, 2)).astype(jnp.int32)
        carry = (pos0, prev0, ctl.init())
    cycles = jnp.arange(start_cycle, start_cycle + n, dtype=jnp.int32)
    final, logs = run(ctl.consts, carry, cycles)
    return logs, final


def _run_video_live_roi(
    params: EngineParams,
    config: LiveLoopConfig,
    frame_source: Callable,
    window_source: Callable,
    num_frames: int,
    detector_model: YoloV8,
    detector_variables: dict,
    predictor,
    init_position: tuple[int, int],
    win_hw: tuple[int, int],
    chunk_cycles: int,
    speed_cap: float,
    detect_fn,
    detect_preprocessed_fn,
    roi_stats: dict | None,
) -> CycleLog:
    """ROI streaming: speculated per-frame windows + exact replay recovery.

    The tracker only ever crops a camera-sized view, so reading and uploading
    whole frames wastes ``full_area/window_area`` of every byte (the two
    measured bottlenecks of the full-frame path — cold disk reads and the
    host→device transfer, docs/performance.md round 4).  Windows for a chunk
    are speculated by constant-velocity extrapolation of the platform
    trajectory *one chunk ahead* (so decode still overlaps device compute);
    after each chunk's scan the logged positions prove whether every crop was
    inside its window.  A miss replays the chunk from its entry carry with
    corrected windows — cycles with verified positions get exactly-centered
    windows, later cycles a fresh speculation — so the output is bit-identical
    to the full-frame path no matter how bad the speculation was.
    """
    L = params.cycle_n
    IM = params.imaging_n
    n_cycles = params.n_logged_cycles(num_frames)
    F = chunk_cycles * L
    win_h, win_w = win_hw

    probe = frame_source(0, 1)
    H, W = probe.shape[1:3]
    if not (params.cam_h <= win_h <= H and params.cam_w <= win_w <= W):
        raise ValueError(f"roi_window {win_hw} must cover the camera view and fit the frame")

    controller = video_live_controller(
        params, config, detector_model, detector_variables, predictor,
        (F, win_h, win_w), detect_fn=detect_fn,
        detect_preprocessed_fn=detect_preprocessed_fn, roi_full_hw=(H, W),
    )
    PC, PH, PW = controller.consts["frames"].shape

    cam_half = np.array([params.cam_w // 2, params.cam_h // 2], dtype=np.int64)
    cam_max = np.array([W - params.cam_w, H - params.cam_h], dtype=np.int64)
    win_half = np.array([win_w // 2, win_h // 2], dtype=np.int64)
    win_max = np.array([W - win_w, H - win_h], dtype=np.int64)
    slack = np.array([win_w - params.cam_w, win_h - params.cam_h], dtype=np.int64)

    # verified per-frame platform positions (filled as chunks pass their check)
    known = np.zeros((n_cycles, L, 2), dtype=np.int64)

    def _vel(hist, anchor_cycle: int) -> np.ndarray:
        """px/cycle from up to 4 verified cycles back; capped (a velocity read
        across an arena-bounce would otherwise fling the speculation)."""
        k = min(4, anchor_cycle)
        if k <= 0:
            return np.zeros(2)
        v = (hist(anchor_cycle) - hist(anchor_cycle - k)) / k
        return np.clip(v, -speed_cap, speed_cap)

    def _center(pos: np.ndarray) -> np.ndarray:
        """Window origins centered on positions, clipped into the frame."""
        return np.clip(np.round(pos).astype(np.int64) - win_half, 0, win_max)

    def speculate(first_cycle: int, n: int, anchor_cycle: int, hist) -> np.ndarray:
        """(n·L, 2) int32 window origins for cycles [first_cycle, first_cycle+n)."""
        if anchor_cycle < 0:
            pred = np.tile(np.asarray(init_position, dtype=np.float64), (n, 1))
        else:
            p = hist(anchor_cycle).astype(np.float64)
            v = _vel(hist, anchor_cycle)
            cs = np.arange(first_cycle, first_cycle + n, dtype=np.float64)
            pred = p + v * (cs - anchor_cycle)[:, None]
        return np.repeat(_center(pred), L, axis=0).astype(np.int32)

    def check(pos: np.ndarray, wtl: np.ndarray) -> tuple[int, int] | None:
        """First (cycle, row) whose crop fell outside its window, else None.

        Mirrors the device's crop origin math exactly: arena top-left =
        clip(position − cam_half, 0, frame − cam)."""
        ctl = np.clip(pos.reshape(-1, 2).astype(np.int64) - cam_half, 0, cam_max)
        d = ctl - wtl[: ctl.shape[0]].astype(np.int64)
        bad = ((d < 0) | (d > slack)).any(axis=1)
        if not bad.any():
            return None
        flat = int(np.argmax(bad))
        return flat // L, flat % L

    known_hist = lambda c: known[c, 0]

    # streaming buffers: ping/pong prefetch + a dedicated replay target (a
    # replay can run while the next chunk's prefetch owns the other slot)
    raw_bufs = [_scratch_buffer(("video-roi-raw", i, F, win_h, win_w), (F, win_h, win_w)) for i in range(3)]
    canvases = [None, None, None]
    if (PH, PW) != (win_h, win_w):
        canvases = [
            _scratch_buffer(("video-roi-canvas", i, PC, PH, PW), (PC, PH, PW)) for i in range(3)
        ]
        for c in canvases:
            c[:] = 0

    def _fetch(start: int, count: int, wtl: np.ndarray, slot: int) -> np.ndarray:
        buf, canvas = raw_bufs[slot], canvases[slot]
        frames = window_source(start, count, wtl[:count], out=buf[:count])
        if canvas is not None:
            canvas[:count, :win_h, :win_w] = frames
            if count < PC:
                canvas[count:] = 0
            return canvas
        if count < PC:
            buf[count:] = 0
        return buf

    import threading

    pending: dict = {}

    def _prefetch(start: int, count: int, wtl: np.ndarray, slot: int) -> threading.Thread:
        def worker():
            try:
                pending["frames"] = _fetch(start, count, wtl, slot)
            except BaseException as e:
                pending["error"] = e

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        return t

    def _dispatch(c0: int, n: int, wtl: np.ndarray, frames: np.ndarray, carry0):
        wtl_pad = np.zeros((F, 2), np.int32)
        wtl_pad[: n * L] = wtl
        ctl = controller._replace(
            consts={
                **controller.consts,
                "frames": jnp.asarray(frames),
                "frame0": jnp.int32(c0 * L),
                "win_tl": jnp.asarray(wtl_pad),
            }
        )
        return run_engine(
            params, ctl, init_position, n, start_cycle=c0, carry=carry0, return_carry=True
        )

    stats = {"chunks": 0, "replays": 0, "max_chunk_replays": 0}

    def _verify(ch: dict) -> bool:
        """Block on the chunk's scan, replay until every crop was in-window.

        Progress per replay is guaranteed: positions are verified through the
        failing crop (an imaging-row miss taints only *later* rows — the move
        that produced the failing row's position was decided on earlier,
        in-window crops), verified cycles get exactly-centered windows, and a
        centered window always contains its crop.  So the first-miss index
        strictly increases and the loop terminates — and in practice each
        replay verifies a whole prefix, so even adversarial trajectories
        (fast worm + minimal window slack) settle in a couple of replays per
        chunk (``max_chunk_replays`` telemetry + the pathological test in
        tests/test_engine_video.py pin this).
        """
        c0, n = ch["c0"], ch["n"]
        chunk_replays = 0
        replayed = False
        for _ in range(n * L + 1):
            pos = np.asarray(ch["logs"].positions)  # (n, L, 2) — forces the scan
            miss = check(pos, ch["wtl"])
            if miss is None:
                break
            replayed = True
            stats["replays"] += 1
            chunk_replays += 1
            j, row = miss
            # positions are true through cycle j's imaging rows always, and
            # through ALL of cycle j when the miss was only in a moving-phase
            # (log) crop — those never feed the controller state
            j_true = j + 1 if row >= IM else j
            new = np.empty((n * L, 2), np.int32)
            new[: j_true * L] = _center(pos[:j_true].reshape(-1, 2))
            if j_true < n:
                hist = lambda c: known[c, 0] if c < c0 else pos[c - c0, 0]
                anchor = c0 + j_true - 1 if j_true > 0 else c0 - 1
                if row < IM:
                    # cycle j's imaging position is true: anchor there
                    anchor = c0 + j
                new[j_true * L :] = speculate(c0 + j_true, n - j_true, anchor, hist)
            frames = _fetch(c0 * L, n * L, new, 2)
            logs, carry1 = _dispatch(c0, n, new, frames, ch["carry0"])
            ch.update(wtl=new, logs=logs, carry1=carry1)
        else:  # pragma: no cover — unreachable, see progress argument above
            raise RuntimeError("ROI window recovery did not converge")
        stats["max_chunk_replays"] = max(stats["max_chunk_replays"], chunk_replays)
        known[c0 : c0 + n] = np.asarray(ch["logs"].positions)
        return replayed

    from wtracker_tpu.sim.engine import init_carry as _init_carry

    chunks = [
        (c0, min(chunk_cycles, n_cycles - c0)) for c0 in range(0, n_cycles, chunk_cycles)
    ]
    carry = _init_carry(params, controller, init_position)
    out_logs: list = [None] * len(chunks)
    prev: dict | None = None

    wtl_i = speculate(0, chunks[0][1], -1, known_hist)
    thread = _prefetch(0, chunks[0][1] * L, wtl_i, 0)

    for i, (c0, n) in enumerate(chunks):
        stats["chunks"] += 1
        thread.join()
        if "error" in pending:
            raise pending["error"]
        frames_i = pending.pop("frames")

        if prev is not None:
            replayed = _verify(prev)
            carry = prev["carry1"]
            out_logs[prev["i"]] = prev["logs"]
            if replayed:
                # this chunk's prefetched windows grew from a stale anchor —
                # refetch synchronously from the now-verified trajectory
                wtl_i = speculate(c0, n, c0 - 1, known_hist)
                frames_i = _fetch(c0 * L, n * L, wtl_i, 2)

        if i + 1 < len(chunks):
            c0n, nn = chunks[i + 1]
            wtl_next = speculate(c0n, nn, c0 - 1, known_hist)
            thread = _prefetch(c0n * L, nn * L, wtl_next, (i + 1) % 2)

        logs, carry1 = _dispatch(c0, n, wtl_i, frames_i, carry)
        prev = {"i": i, "c0": c0, "n": n, "wtl": wtl_i, "logs": logs, "carry0": carry, "carry1": carry1}
        carry = carry1
        if i + 1 < len(chunks):
            wtl_i = wtl_next

    _verify(prev)
    out_logs[prev["i"]] = prev["logs"]
    if roi_stats is not None:
        roi_stats.update(stats)
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *out_logs)

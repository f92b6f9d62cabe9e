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
) -> CycleController:
    """Single-stream live controller reading views from a resident frame chunk.

    ``consts`` carries ``{"det", "mlp", "frames" (C, H, W) uint8, "frame0"}``;
    swap ``frames``/``frame0`` per chunk via ``controller._replace(consts=...)``
    — shapes stay fixed, so the compiled runner is reused.

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

    def crop_and_detect(consts, frame_idx, cam_tls):
        """frame_idx (N,) absolute; cam_tls (N, 2) arena coords → (N, 4) abs."""
        local = jnp.clip(frame_idx - consts["frame0"], 0, C - 1)
        # clamp crops fully inside the (original) frame
        tls = jnp.stack(
            [jnp.clip(cam_tls[:, 0], 0, W - params.cam_w), jnp.clip(cam_tls[:, 1], 0, H - params.cam_h)],
            axis=1,
        )
        if use_pallas:
            from wtracker_tpu.models.yolov8 import detect_top1_preprocessed, letterbox_params
            from wtracker_tpu.ops.pallas_preproc import crop_letterbox_views

            x = crop_letterbox_views(
                consts["frames"], local, tls, params.cam_w, config.imgsz[0],
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
            views = crop_views(frames, tls, view_hw)
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
            "video", detect_fn, detect_preprocessed_fn, tuple(chunk_shape),
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

    Returns stacked logs over all complete cycles.
    """
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

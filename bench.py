"""Headline benchmark: closed-loop sim steps/sec/chip (YOLOv8s@416 + ResMLP).

Runs the full live tracking loop — on-device synthetic microscopy rendering,
YOLOv8s detection of every frame at 416 px (bf16), ResMLP movement prediction,
sine-motor platform control — as stream-batched `lax.scan` cycles on one chip,
and reports steps (frames) per second against the 5,000/s/chip target
(BASELINE.json).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _device_health_check(timeout_s: int = 90, attempts: int = 10, wait_s: int = 60) -> bool:
    """Run a trivial op with a hard timeout — the axon tunnel can wedge in a
    state where every jax call (even devices()) blocks forever.

    The tunnel wedges in stretches of minutes and recovers on its own, so a
    single probe at an unlucky moment would falsely report the device dead
    (round 1 lost its headline number exactly this way). Probe repeatedly for
    up to ~15 minutes before giving up."""
    import subprocess
    import sys

    code = "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8, 128)))))"
    for attempt in range(attempts):
        try:
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, timeout=timeout_s, text=True
            )
            if "1024.0" in out.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if attempt < attempts - 1:
            time.sleep(wait_s)
    return False


def _unavailable(note: str) -> str:
    return json.dumps(
        {
            "metric": "closed-loop sim steps/sec/chip (YOLOv8s@416+ResMLP, every frame detected)",
            "value": 0.0,
            "unit": "steps/s",
            "vs_baseline": 0.0,
            "note": note,
        }
    )


def main() -> None:
    """Watchdog wrapper: health-probe (with retries), then run the measurement
    in a timed subprocess — a tunnel wedge mid-run must not hang the driver —
    retrying once more after a fresh health probe if the attempt dies."""
    import subprocess

    if os.environ.get("WTRACKER_BENCH_INNER"):
        _measure()
        return

    if not _device_health_check():
        print(_unavailable("device unavailable: the TPU tunnel did not answer a trivial op for ~15 min"))
        return

    env = {**os.environ, "WTRACKER_BENCH_INNER": "1"}
    for attempt in range(2):
        try:
            # headline + int8 + latency phase, cold compiles worst-case; the
            # opt-in video phase streams a multi-GB recording off disk on top
            timeout = 3300 + (1500 if os.environ.get("BENCH_VIDEO", "0") != "0" else 0)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True,
                timeout=timeout,
                text=True,
                env=env,
            )
            lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if lines:
                print(lines[-1])
                return
        except subprocess.TimeoutExpired:
            pass
        if attempt == 0 and not _device_health_check():
            break
    print(_unavailable("device unavailable: the measurement subprocess hung/died twice (tunnel wedge)"))


def build_flagship(S: int | None = None, n_cycles: int | None = None, chunks: int | None = None):
    """Build the flagship closed-loop workload (shared with tools/trace_profile.py).

    Returns a namespace with the engine params/config, initial positions, the
    steps-per-window count, and ``make_ctl(variant)`` producing the cycle
    controller for the ``"bf16"`` headline or the ``"int8"`` serving path.
    """
    os.environ.setdefault("WTRACKER_TPU_NO_X64", "")  # keep x64 default
    # persistent compilation cache: skipping the ~4-minute remote compile
    # halves the bench's exposure to tunnel wedges (measured 8m40s -> 3m58s)
    cache_dir = os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/wtracker-jax-cache")
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    import jax.numpy as jnp

    import wtracker_tpu  # noqa: F401  (enables x64)
    from wtracker_tpu.models.resmlp import load_torch_checkpoint, make_rmlp_predictor
    from wtracker_tpu.models.yolov8 import YoloV8
    from wtracker_tpu.neural.config import IOConfig
    from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
    from wtracker_tpu.sim.engine import EngineParams, headless_frame_shape, run_engine_streams
    from wtracker_tpu.sim.engine_live import LiveLoopConfig, make_stream_batch_fused
    from wtracker_tpu.sim.synthetic import SyntheticScene, make_trajectory

    # reference experiment geometry (experiments/exp0): 60 fps, 1400x1600 px,
    # 4x4 mm camera (360 px), default timing 200/40/50 ms -> 15-frame cycles
    exp = ExperimentConfig("bench", 60_000, 60, (1400, 1600), 90, (700, 700))
    timing = TimingConfig(
        experiment_config=exp,
        imaging_time_ms=200.0,
        pred_time_ms=40.0,
        moving_time_ms=50.0,
        camera_size_mm=(4.0, 4.0),
        micro_size_mm=(0.32, 0.32),
    )
    params = EngineParams.from_timing(timing, headless_frame_shape(timing, exp.orig_resolution))

    # 24-cycle windows (~5 s each): long enough that the tunnel's fixed
    # per-window cost (dispatch + log fetch) is amortized to <5% — the
    # device-trace-true cycle time is 195 ms (docs/performance.md round 3)
    S = S or int(os.environ.get("BENCH_STREAMS", "96"))
    N_CYCLES = n_cycles or int(os.environ.get("BENCH_CYCLES", "24"))

    # flagship models: YOLOv8s @416 bf16 (BN-fused inference form) + the
    # reference's shipped ResMLP.  Detector weights: the NATIVELY TRAINED
    # s/416 checkpoint (models/yolov8s_worm416.npz, round 5) when present —
    # so the bf16 headline, the int8 ratio and the latency numbers are all
    # demonstrated on trained magnitudes, not just random init.  BENCH_WEIGHTS
    # =random opts out (throughput itself is weight-value independent — same
    # graph, same dtypes; the reference's own trained yolov8s blobs are absent
    # upstream, .MISSING_LARGE_BLOBS:6-7).
    from wtracker_tpu.models.yolov8 import YoloV8Detector, fuse_conv_bn

    _ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)), "models", "yolov8s_worm416.npz")
    _use_trained = os.path.exists(_ckpt) and os.environ.get("BENCH_WEIGHTS", "trained") != "random"
    if _use_trained:
        _raw = YoloV8Detector.load(_ckpt, imgsz=(416, 416))
        assert _raw.model.scale == "s"
    else:
        _raw = YoloV8Detector.init_random(nc=1, scale="s", imgsz=(416, 416), compute_dtype=jnp.bfloat16, seed=0)
    det_model = YoloV8(nc=1, scale="s", compute_dtype=jnp.bfloat16, fused=True)
    det_vars = fuse_conv_bn(_raw.variables)
    detector_weights = "trained:models/yolov8s_worm416.npz" if _use_trained else "random-init"

    resmlp_path = "/root/reference/models/ResMLP(imaging-200ms_pred-40ms_moving-50ms).pt"
    if os.path.exists(resmlp_path):
        predictor = load_torch_checkpoint(resmlp_path, reference_root="/root/reference")
    else:  # fall back to a fresh predictor with the same topology
        predictor = make_rmlp_predictor(IOConfig([0, -3, -6, -9, -12], [3]))

    arena = (1400, 1600)
    trajs = np.stack([make_trajectory(60_000, arena, seed=i) for i in range(S)])
    # chunk the per-cycle flat batch so each detect sub-batch stays HBM-friendly —
    # large flat batches thrash HBM (measured 38.3k img/s at B=360 vs 12.7k
    # at B=1440, docs/performance.md). The sweet spot is dtype-dependent: the
    # round-4 device-trace sweep found the int8 path fastest at ~240 views per
    # sub-batch (136.5 ms/cycle at B=240 vs 140.7 at B=360 and a 193.5 cliff
    # at B=180), while bf16 stays best at ~360.
    n_views = S * params.cycle_n

    def pick_chunks(target_views: int, env: str) -> int:
        """Chunk count whose views/chunk lands nearest ``target_views``.

        Per-variant override first (BENCH_CHUNKS_INT8 / BENCH_CHUNKS_BF16),
        then the shared BENCH_CHUNKS / ``chunks`` arg; otherwise search the
        divisors of n_views in BOTH directions for the one minimizing
        |views/chunk - target| (a downward-only search can land far past the
        measured HBM knee for non-default stream counts)."""
        override = chunks or int(os.environ.get(env, "0")) or int(os.environ.get("BENCH_CHUNKS", "0"))
        if override:
            c = override
            while n_views % c:
                c -= 1
            return c
        divisors = [d for d in range(1, n_views + 1) if n_views % d == 0]
        return min(divisors, key=lambda d: abs(n_views / d - target_views))

    chunks_bf16 = pick_chunks(360, "BENCH_CHUNKS_BF16")
    chunks_int8 = pick_chunks(240, "BENCH_CHUNKS_INT8")
    cfg = LiveLoopConfig(
        imgsz=(416, 416),
        conf=0.1,
        ring_size=64,
        log_mode=True,  # detect EVERY frame, like the logging reference loop
        max_dist_per_pred=54.0,
        detect_chunks=chunks_bf16,
    )
    scene = SyntheticScene()
    init_pos = np.tile([700, 700], (S, 1))
    steps = S * N_CYCLES * params.cycle_n

    _int8_cache: dict = {}

    def int8_path():
        """(quantized weights, folded-stem int8 detect_fn), built once.

        Folded-stem serving path (stem as letterbox matmuls) — the 360->416
        bench geometry letterboxes without padding, so this is exactly what
        track_video.py deploys.
        """
        if not _int8_cache:
            from wtracker_tpu.models.yolov8_int8 import make_detect_fns, quantize_detector

            traj = trajs[0]
            xy = traj[:32].astype(np.float32)
            tls = np.clip(xy - 180, 0, [arena[1] - 360, arena[0] - 360]).astype(np.float32)
            calib = np.asarray(
                scene.render_views(jnp.asarray(xy), jnp.asarray(tls), (360, 360), jnp.arange(32))
            )
            q = quantize_detector(det_model, det_vars, calib, (416, 416))
            detect_int8, _ = make_detect_fns(
                q, src_hw=(params.cam_h, params.cam_w), imgsz=(416, 416)
            )
            _int8_cache["qw"] = q.device_weights()
            _int8_cache["detect"] = detect_int8
        return _int8_cache["qw"], _int8_cache["detect"]

    def make_ctl(variant: str = "bf16"):
        if variant == "bf16":
            return make_stream_batch_fused(params, cfg, scene, trajs, det_model, det_vars, predictor)
        if variant == "int8":
            from dataclasses import replace

            qw, detect_int8 = int8_path()
            cfg8 = replace(cfg, detect_chunks=chunks_int8)
            return make_stream_batch_fused(
                params, cfg8, scene, trajs, det_model, qw, predictor, detect_fn=detect_int8
            )
        raise ValueError(f"unknown variant {variant!r}")

    def make_decide(variant: str = "bf16", S: int = 1):
        """The standalone deployment decision at S streams: jitted
        ``decide(views, cam_tl) -> (S, 2)`` plus realistic example inputs.

        This is the work the real instrument must finish inside the 40 ms
        ``pred_time_ms`` window (reference models the deadline at
        sim/simulator.py:173-180 + sim/config.py:46-48): detect the
        predictor's input frames, assemble the bbox history, run the MLP,
        emit the platform move.
        """
        import jax
        from dataclasses import replace

        from wtracker_tpu.sim.engine_live import make_decision_step

        view_hw = (params.cam_h, params.cam_w)
        dcfg = replace(cfg, detect_chunks=1)  # a k-view batch never needs chunking
        if variant == "bf16":
            dv, detect_fn = det_vars, None
        elif variant == "int8":
            dv, detect_fn = int8_path()
        else:
            raise ValueError(f"unknown variant {variant!r}")
        step = make_decision_step(
            dcfg, det_model, dv, predictor, view_hw, detect_fn=detect_fn
        )
        mlp_vars = predictor.variables
        decide = jax.jit(lambda views, cam_tl: step(dv, mlp_vars, views, cam_tl))

        k = len(predictor.io_config.input_frames)
        rng = np.random.default_rng(0)
        cam_tl = jnp.asarray(rng.uniform(100, 900, (S, 2)).round(), jnp.float32)
        worm = np.asarray(cam_tl)[:, None] + [params.cam_w / 2, params.cam_h / 2]
        worm = jnp.asarray(worm + rng.uniform(-8, 8, (S, k, 2)), jnp.float32)
        views = scene.render_views(
            worm.reshape(S * k, 2),
            jnp.repeat(cam_tl, k, axis=0),
            view_hw,
            jnp.arange(S * k),
        ).reshape(S, k, *view_hw)
        return decide, views, cam_tl

    import types

    return types.SimpleNamespace(
        params=params,
        cfg=cfg,
        chunks_int8=chunks_int8,
        init_pos=init_pos,
        n_cycles=N_CYCLES,
        steps=steps,
        make_ctl=make_ctl,
        make_decide=make_decide,
        det_model=det_model,
        det_vars=det_vars,
        predictor=predictor,
        int8_path=int8_path,
        scene=scene,
        run=lambda ctl: run_engine_streams(params, ctl, init_pos, N_CYCLES, delayed_log=True),
    )


def _tails_ms(samples_s: list[float]) -> dict:
    """p50/p95/max (ms) of a latency sample list — the statistics a deadline
    guarantee is made of (a min or a mean hides the executions that miss)."""
    a = np.sort(np.asarray(samples_s)) * 1e3
    return {
        "p50_ms": round(float(np.percentile(a, 50)), 3),
        "p95_ms": round(float(np.percentile(a, 95)), 3),
        "max_ms": round(float(a[-1]), 3),
    }


def measure_decision_latency(ctx, variant: str, S: int, n: int = 200) -> dict:
    """Per-decision latency of the deployment decision step, two ways:

    - ``device``: the PER-DECISION device busy-time distribution (p50/p95/max
      over ``n`` decisions) from the xplane trace's "XLA Modules" events —
      one event per dispatch, so the tail is measured, not inferred from a
      mean. The trace is the only trustworthy methodology through the axon
      tunnel (wall-clock drifts 2x run to run, docs/performance.md); on real
      hardware without the tunnel this is what the instrument pays.
    - ``e2e``: blocking wall-time distribution per decision through the
      tunnel (upper bound: includes the tunnel's ~36 ms dispatch round trip,
      which a co-located host would not pay).

    ``device_ms``/``e2e_ms`` (the round-4 fields: trace mean / wall min) stay
    for cross-round comparability.
    """
    import shutil
    import tempfile

    import jax

    decide, views, cam_tl = ctx.make_decide(variant, S)
    np.asarray(decide(views, cam_tl))  # compile + warm

    e2e = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(decide(views, cam_tl))
        e2e.append(time.perf_counter() - t0)

    trace_dir = tempfile.mkdtemp(prefix=f"wtracker-latency-{variant}-s{S}-")
    try:
        with jax.profiler.trace(trace_dir):
            for _ in range(n):
                out = decide(views, cam_tl)
            np.asarray(out)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.trace_profile import parse_xspace_events

        module_events, _, _ = parse_xspace_events(trace_dir)
        # the decide module is the one executed ~n times; other modules in the
        # trace window (transfers, stray warmup) appear once or twice
        by_name: dict[str, list[int]] = {}
        for name, ps in module_events:
            by_name.setdefault(name, []).append(ps)
        decide_ps = max(by_name.values(), key=len, default=[])
        device_s = [ps / 1e12 for ps in decide_ps]
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)

    out = {
        "n": n,
        "device_ms": round(float(np.mean(device_s)) * 1e3, 3) if device_s else float("nan"),
        "e2e_ms": round(min(e2e) * 1e3, 3),
        "e2e": _tails_ms(e2e),
    }
    if device_s:
        out["device"] = _tails_ms(device_s)
    return out


def measure_decision_cadence(ctx, variant: str, budget_ms: float, n: int = 100) -> dict:
    """Sustained-cadence check: dispatch one S=1 decision every 250 ms — the
    cycle period of the reference's 60 fps / 15-frame schedule
    (sim/config.py ceil(200+40+50 ms -> 15 frames) / 60 fps) — and count
    decisions whose blocking completion misses the 40 ms ``pred_time`` window
    (/root/reference/wtracker/sim/simulator.py:173-180 models exactly this
    deadline). Misses are counted on e2e wall time THROUGH the tunnel, so a
    co-located deployment strictly beats this number.
    """
    period_s = 0.250
    decide, views, cam_tl = ctx.make_decide(variant, 1)
    np.asarray(decide(views, cam_tl))  # compile + warm

    lat = []
    next_tick = time.perf_counter() + period_s
    for _ in range(n):
        while True:
            now = time.perf_counter()
            if now >= next_tick:
                break
            time.sleep(min(0.002, next_tick - now))
        t0 = time.perf_counter()
        np.asarray(decide(views, cam_tl))
        lat.append(time.perf_counter() - t0)
        next_tick += period_s

    misses = int(sum(1 for t in lat if t * 1e3 > budget_ms))
    return {
        "period_ms": 250.0,
        "n": n,
        "misses": misses,
        **_tails_ms(lat),
        "verdict": (
            f"{variant} S=1 at the 250 ms cycle cadence: {misses}/{n} decisions "
            f"missed the {budget_ms:.0f} ms window (e2e through the tunnel)"
        ),
    }


def _measure() -> None:
    import jax.numpy as jnp

    ctx = build_flagship()
    REPEATS = int(os.environ.get("BENCH_REPEATS", "5"))

    def measure(ctl):
        # warmup (compile) — fetch a value to force full execution, then the
        # fastest sustained window of REPEATS (the tunnel adds latency jitter
        # per dispatch; each window is N_CYCLES full cycles of work)
        logs = ctx.run(ctl)
        _ = float(jnp.sum(logs.positions))
        dts = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            logs = ctx.run(ctl)
            _ = float(jnp.sum(logs.positions))  # forced device fetch per repeat
            dts.append(time.perf_counter() - t0)
        return ctx.steps / min(dts), ctx.steps / (sum(dts) / len(dts))

    steps_per_sec, mean_steps_per_sec = measure(ctx.make_ctl("bf16"))

    n_views = ctx.steps // ctx.n_cycles
    result = {
        "metric": "closed-loop sim steps/sec/chip (YOLOv8s@416+ResMLP, every frame detected)",
        "value": round(steps_per_sec, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / 5000.0, 3),
        # min-of-REPEATS is the steady-state number; the mean is reported
        # alongside so the distribution is visible, not just its flattering end
        "mean": round(mean_steps_per_sec, 1),
        # resolved detect chunking per variant (views/chunk is the HBM-knee
        # control variable, docs/performance.md) so overrides are auditable
        "chunks": {
            "bf16": ctx.cfg.detect_chunks,
            "int8": ctx.chunks_int8,
            "views_per_chunk_bf16": n_views // ctx.cfg.detect_chunks,
            "views_per_chunk_int8": n_views // ctx.chunks_int8,
        },
    }

    # flagship-gate record: tools/run_gates.py executes the s/416 gates and
    # writes GATES.json; surface its summary here so every BENCH_r{N}.json
    # carries the latest committed gate run (pass/fail, timings, commit)
    gates_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "GATES.json")
    if os.path.exists(gates_path):
        with open(gates_path) as f:
            result["gates"] = json.load(f)

    # int8 serving path (same loop, PTQ detector; measured 0.00 px median
    # top-1 drift vs bf16 on rendered views — models/yolov8_int8.py): reported
    # alongside the bf16 headline. BENCH_INT8=0 skips it.
    if os.environ.get("BENCH_INT8", "1") != "0":
        v8, m8 = measure(ctx.make_ctl("int8"))
        result["int8"] = {"value": round(v8, 1), "mean": round(m8, 1),
                          "vs_baseline": round(v8 / 5000.0, 3)}

    # closed-loop decision latency vs the domain's 40 ms pred_time budget
    # (the real-time constraint the whole cycle schedule exists to model —
    # reference sim/config.py:46-48). BENCH_LATENCY=0 skips it.
    if os.environ.get("BENCH_LATENCY", "1") != "0":
        budget_ms = 40.0
        lat = {"budget_ms": budget_ms}
        for variant in ("bf16",) + (("int8",) if "int8" in result else ()):
            for S in (1, 4):
                lat[f"{variant}_s{S}"] = measure_decision_latency(ctx, variant, S)
            lat[f"{variant}_cadence"] = measure_decision_cadence(ctx, variant, budget_ms)
        d = lat["bf16_s1"]
        dev_p95 = d.get("device", {}).get("p95_ms", d["device_ms"])
        # a deadline verdict is a tail claim: p95/max on-device, plus the
        # sustained-cadence miss count at the real 250 ms schedule
        ok = (dev_p95 if np.isfinite(dev_p95) else d["e2e"]["p95_ms"]) <= budget_ms
        misses = lat["bf16_cadence"]["misses"]
        lat["verdict"] = (
            f"bf16 S=1 decision p95 {dev_p95:.2f} ms on-device "
            f"(max {d.get('device', {}).get('max_ms', float('nan')):.2f} ms; e2e p95 "
            f"{d['e2e']['p95_ms']:.1f} ms through the tunnel) vs the 40 ms pred_time "
            f"budget: " + ("WITHIN budget" if ok else "OVER budget")
            + f"; cadence: {misses} missed windows in {lat['bf16_cadence']['n']} cycles"
        )
        result["latency_ms"] = lat

    # real-video path (disk BMP recording → native decode → track), opt-in:
    # BENCH_VIDEO=1 with a recording pre-generated by
    # `python tools/bench_video.py --generate` (the 12k-frame 1400×1600
    # recording is ~27 GB, far too slow to render inside a bench run).
    # Measured numbers live in docs/performance.md round 4.
    if os.environ.get("BENCH_VIDEO", "0") != "0":
        video_dir = os.environ.get("BENCH_VIDEO_DIR", "/tmp/wtracker-video-bench")
        if os.path.isdir(video_dir):
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from tools.bench_video import run as run_video_bench

            result["video_path"] = run_video_bench(video_dir, "bf16")
            # ROI streaming variant (identical output, fraction of the IO) —
            # BENCH_VIDEO_ROI=0 skips, any other value is the window in px
            roi = int(os.environ.get("BENCH_VIDEO_ROI", "512"))
            if roi:
                result["video_path_roi"] = run_video_bench(video_dir, "bf16", roi=roi)
        else:
            result["video_path"] = {"note": f"recording absent: {video_dir}"}

    print(json.dumps(result))


if __name__ == "__main__":
    main()

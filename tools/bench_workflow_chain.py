#!/usr/bin/env python
"""Time the reference's full workflow chain at experiment geometry, by CLI.

The reference's end-to-end story (its docs/workflows.md:9-43) is:
initialize the experiment over the raw recording (YOLO over every frame +
background extraction — "up to few hours",
/root/reference/workflows/initialize_experiment.ipynb cell 11), run the
closed-loop tracking, analyze the log (incl. the segmentation-based precise
error), and render the visualization.  This tool runs the SAME chain with
this framework's workflow CLIs over a reference-geometry recording
(1400×1600 @ 60 fps, generated once by ``tools/bench_video.py --generate``)
and records wall time per stage — the measured counterpart of the
reference's qualitative "few hours" (VERDICT r4 item 6).

Stages (each an actual subprocess of the public CLI):

1. ``workflows/initialize_experiment.py`` — background + per-frame detection
   over the whole recording (trained s/416 detector when the committed
   checkpoint exists, else the classical bootstrap detector).
2. ``workflows/track_video.py``           — the closed loop over the recording
   (ROI streaming by default; ``--no-roi`` for full frames).
3. ``workflows/analysis.py``              — log analysis incl. the batched
   precise (segmentation) error against the recording + background.
4. ``workflows/visualize.py``             — annotated mp4 of the first cycles.

Writes one JSON line + ``WORKFLOW_CHAIN.json`` at the repo root; the measured
table lives in docs/performance.md.

Usage::

    python tools/bench_video.py --generate --frames 12000   # once (~27 GB)
    python tools/bench_workflow_chain.py [--dir /tmp/wtracker-video-bench]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_stage(name: str, cmd: list[str], record: dict, timeout: int = 7200) -> None:
    print(f"[chain] {name}: {' '.join(cmd)}", flush=True)
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable] + cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout
    )
    dt = time.perf_counter() - t0
    tail = "\n".join((out.stdout + out.stderr).strip().splitlines()[-6:])
    record[name] = {"seconds": round(dt, 1), "ok": out.returncode == 0}
    print(f"[chain]   -> {dt:.1f}s (exit {out.returncode})\n{tail}\n", flush=True)
    if out.returncode != 0:
        raise SystemExit(f"stage {name} failed:\n{tail}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--dir", default="/tmp/wtracker-video-bench", help="recording directory")
    ap.add_argument("--work", default="/tmp/wtracker-chain", help="output workspace")
    ap.add_argument("--roi", type=int, default=512, help="ROI window for tracking (0 = full frames)")
    ap.add_argument("--viz-frames", type=int, default=600, help="frames to render into the mp4")
    ap.add_argument("--output", default=os.path.join(REPO, "WORKFLOW_CHAIN.json"))
    args = ap.parse_args()

    if not os.path.isdir(args.dir):
        raise SystemExit(f"{args.dir} missing — run tools/bench_video.py --generate first")
    os.makedirs(args.work, exist_ok=True)

    n_frames = len([f for f in os.listdir(args.dir) if f.endswith((".bmp", ".png"))])
    ckpt = os.path.join(REPO, "models", "yolov8s_worm416.npz")
    trained = os.path.exists(ckpt)

    exp_dir = os.path.join(args.work, "experiment")
    track_dir = os.path.join(args.work, "track")
    analysis_dir = os.path.join(args.work, "analysis")
    record: dict = {}

    # 1. initialize: background + detect EVERY frame (the reference's
    #    hours-long stage, initialize_experiment.ipynb cell 11)
    det_args = (
        ["--detector", "yolo", "--yolo-weights", ckpt, "--imgsz", "416"]
        if trained
        else ["--detector", "classical"]
    )
    run_stage(
        "initialize_experiment",
        ["workflows/initialize_experiment.py", "--frames", args.dir, "--output", exp_dir,
         "--name", "chain", "--px-per-mm", "90", "--init-position", "700", "700", *det_args],
        record,
    )

    # shared timing config at the reference's deployed schedule
    timing_path = os.path.join(args.work, "timing.json")
    if not os.path.exists(timing_path):
        sys.path.insert(0, REPO)
        from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig

        exp = ExperimentConfig.load_json(os.path.join(exp_dir, "exp_config.json"))
        TimingConfig(
            experiment_config=exp, imaging_time_ms=200.0, pred_time_ms=40.0,
            moving_time_ms=50.0, camera_size_mm=(4.0, 4.0), micro_size_mm=(0.32, 0.32),
        ).save_json(timing_path)

    # 2. closed-loop tracking over the recording (the trained detector when
    #    committed, else a fresh random-init export — throughput-identical)
    det_path = ckpt
    if not trained:
        det_path = os.path.join(args.work, "det_random.npz")
        if not os.path.exists(det_path):
            from wtracker_tpu.models.yolov8 import YoloV8Detector

            YoloV8Detector.init_random(nc=1, scale="s", imgsz=(416, 416), seed=0).save(det_path)
    resmlp = "/root/reference/models/ResMLP(imaging-200ms_pred-40ms_moving-50ms).pt"
    track_cmd = [
        "workflows/track_video.py", "--frames", args.dir, "--output", track_dir,
        "--timing-config", timing_path, "--exp-config", os.path.join(exp_dir, "exp_config.json"),
        "--detector", det_path, "--imgsz", "416",
    ]
    if os.path.exists(resmlp):
        track_cmd += ["--predictor", resmlp]
    if args.roi:
        track_cmd += ["--roi", str(args.roi)]
    run_stage("track_video", track_cmd, record)

    # 3. analysis incl. the segmentation precise error over the raw recording
    run_stage(
        "analysis",
        ["workflows/analysis.py", "--timing-config", timing_path,
         "--log", os.path.join(track_dir, "bboxes.csv"), "--output", analysis_dir,
         "--worm-crops", args.dir, "--background", os.path.join(exp_dir, "background.npy"),
         "--remove-anomalies"],
        record,
    )

    # 4. visualization mp4 of the first cycles
    run_stage(
        "visualize",
        ["workflows/visualize.py", "--timing-config", timing_path,
         "--log", os.path.join(track_dir, "bboxes.csv"), "--frames", args.dir,
         "--video", os.path.join(args.work, "tracking.mp4"), "--stop", str(args.viz_frames)],
        record,
    )

    total = round(sum(s["seconds"] for s in record.values()), 1)
    result = {
        "recording": {"dir": args.dir, "frames": n_frames, "geometry": "1400x1600 @ 60 fps (exp0)"},
        "detector": "trained s/416 (models/yolov8s_worm416.npz)" if trained else "classical bootstrap",
        "roi": args.roi or None,
        "stages": record,
        "total_seconds": total,
        "reference_quote": "initialize alone: 'might take very long time, up to few hours' "
        "(/root/reference/workflows/initialize_experiment.ipynb cell 11)",
    }
    with open(args.output, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps({"chain_total_s": total, **{k: v["seconds"] for k, v in record.items()}}))


if __name__ == "__main__":
    main()

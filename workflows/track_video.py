#!/usr/bin/env python
"""Live tracking over a recorded experiment: the full YOLO→ResMLP closed loop.

Streams the recording through the TPU in chunks (native BMP decode on host,
crops + detection + control on device) and writes the 17-column bboxes.csv.
This is the engine form of running YoloController inside the simulator
(reference: initialize_experiment.ipynb's detection pass / simulate with live
YOLO), at production throughput.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", required=True, help="directory of frame images")
    ap.add_argument("--timing-config", required=True)
    ap.add_argument("--exp-config", required=True)
    ap.add_argument(
        "--detector",
        required=True,
        help="YOLO weights (.npz or ultralytics .pt), or an int8 deployment "
        "artifact from quantize_detector.py (auto-detected)",
    )
    ap.add_argument("--predictor", help="ResMLP checkpoint (.npz/.pt); detection-centering if omitted")
    ap.add_argument("--output", required=True, help="output folder for bboxes.csv")
    ap.add_argument("--imgsz", type=int, default=416)
    ap.add_argument("--conf", type=float, default=0.1)
    ap.add_argument("--chunk-cycles", type=int, default=64)
    ap.add_argument(
        "--roi",
        type=int,
        default=None,
        metavar="PX",
        help="ROI streaming: read/upload only a PX-sized window per frame "
        "(speculated from the platform trajectory; missed windows replay "
        "exactly, so output is identical to full-frame). Cuts cold-disk "
        "bytes ~full_h/PX and host->device bytes by the window area ratio.",
    )
    ap.add_argument("--roi-chunk-cycles", type=int, default=8)
    ap.add_argument(
        "--pallas-preproc",
        action=argparse.BooleanOptionalAction,
        default=None,
        help="fused crop+letterbox Pallas kernel (default: auto — on for TPU "
        "backends with square camera/imgsz; measured 3-16x faster)",
    )
    args = ap.parse_args()

    import numpy as np

    from wtracker_tpu.models.yolov8 import YoloV8Detector
    from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
    from wtracker_tpu.sim.engine import EngineParams, logs_to_frame
    from wtracker_tpu.sim.engine_live import LiveLoopConfig
    from wtracker_tpu.sim.engine_video import run_video_live
    from wtracker_tpu.utils.frame_reader import FrameReader
    from wtracker_tpu.utils.path_utils import create_directory, join_paths

    timing = TimingConfig.load_json(args.timing_config)
    exp = ExperimentConfig.load_json(args.exp_config)

    reader = FrameReader.create_from_directory(args.frames)

    from wtracker_tpu.models.yolov8_int8 import is_quantized_artifact

    detect_fn = detect_preprocessed_fn = None
    if args.detector.endswith(".npz") and is_quantized_artifact(args.detector):
        import jax.numpy as jnp

        from wtracker_tpu.models.yolov8 import YoloV8
        from wtracker_tpu.models.yolov8_int8 import QuantizedYolo, make_detect_fns

        q = QuantizedYolo.load(args.detector)
        det_model = YoloV8(nc=q.nc, scale=q.scale, reg_max=q.reg_max, compute_dtype=jnp.bfloat16, fused=True)
        det_variables = q.device_weights()
        cam_hw = (timing.camera_size_px[1], timing.camera_size_px[0])
        detect_fn, detect_preprocessed_fn = make_detect_fns(
            q, src_hw=cam_hw, imgsz=(args.imgsz, args.imgsz)
        )
    else:
        det = YoloV8Detector.load(args.detector, imgsz=args.imgsz, conf=args.conf).fuse()
        det_model, det_variables = det.model, det.variables

    if args.predictor:
        from wtracker_tpu.models.resmlp import load_predictor, load_torch_checkpoint

        predictor = (
            load_torch_checkpoint(args.predictor)
            if args.predictor.endswith(".pt")
            else load_predictor(args.predictor)
        )
    else:
        from wtracker_tpu.models.resmlp import make_rmlp_predictor
        from wtracker_tpu.neural.config import IOConfig

        predictor = make_rmlp_predictor(IOConfig([0], [max(timing.pred_frame_num, 1)]))

    params = EngineParams.from_timing(timing, reader.frame_size)
    max_speed_px_frame = 0.9 * (timing.px_per_mm / timing.frames_per_sec)
    cfg = LiveLoopConfig(
        imgsz=(args.imgsz, args.imgsz),
        conf=args.conf,
        ring_size=max(64, 2 * params.cycle_n),
        log_mode=True,
        max_dist_per_pred=max_speed_px_frame * max(predictor.io_config.pred_frames[0], 1),
        use_pallas_preproc=args.pallas_preproc,
    )

    roi_stats: dict = {}
    logs = run_video_live(
        params,
        cfg,
        lambda s, n, out=None: reader.read_batch(range(s, min(s + n, len(reader))), out=out),
        len(reader),
        det_model,
        det_variables,
        predictor,
        exp.init_position,
        cycles_per_chunk=args.chunk_cycles,
        detect_fn=detect_fn,
        detect_preprocessed_fn=detect_preprocessed_fn,
        roi_window=args.roi,
        roi_chunk_cycles=args.roi_chunk_cycles,
        window_source=(
            lambda s, n, tls, out=None: reader.read_window_batch(
                range(s, s + n), tls, (args.roi, args.roi), out=out
            )
        )
        if args.roi
        else None,
        roi_stats=roi_stats,
    )
    if roi_stats:
        # replay telemetry: rate ~0 means the speculation holds; a high
        # max-per-chunk would mean the window is too tight for the worm's
        # speed (each replay re-reads + re-scans the chunk)
        rate = roi_stats["replays"] / max(roi_stats["chunks"], 1)
        print(
            f"ROI streaming: {roi_stats['chunks']} chunks, {roi_stats['replays']} "
            f"replays ({rate:.2f}/chunk, worst chunk {roi_stats['max_chunk_replays']})"
        )

    df = logs_to_frame(params, logs)
    create_directory(args.output)
    out = join_paths(args.output, "bboxes.csv")
    df.to_csv(out, index=False)
    print(f"wrote {out} ({len(df)} rows)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Post-training int8 quantization of a trained detector (deployment artifact).

Calibrates per-layer activation scales on views cropped from the experiment's
own recording — on-policy camera windows when a previous run's bboxes.csv is
given, the initial camera window otherwise — then folds + quantizes every
conv kernel to per-output-channel symmetric int8
(:mod:`wtracker_tpu.models.yolov8_int8`). The artifact drops straight into
``track_video.py --detector`` and runs the same closed loop ~1.35x faster
end-to-end on a v5e chip (docs/performance.md round 3), with top-1 box
agreement vs the bf16 path bounded by tests/test_yolov8_int8.py.

The reference deploys its trained model through ultralytics inference as-is
(yolo_controller.py:72-78); it has no quantized serving form — this is the
TPU-native deployment step layered on the same workflow.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--detector", required=True, help="trained weights (.npz or ultralytics .pt)")
    ap.add_argument("--frames", required=True, help="directory of recording frames (calibration source)")
    ap.add_argument("--timing-config", required=True)
    ap.add_argument("--exp-config", required=True)
    ap.add_argument(
        "--bboxes-csv",
        help="bboxes.csv of a previous (bf16) tracking run: calibration views "
        "follow its camera trajectory instead of the initial window",
    )
    ap.add_argument("--calib-frames", type=int, default=64, help="calibration views (spread over the recording)")
    ap.add_argument("--imgsz", type=int, default=416)
    ap.add_argument("--output", required=True, help="output .npz artifact path")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from wtracker_tpu.models.yolov8 import YoloV8Detector
    from wtracker_tpu.models.yolov8_int8 import quantize_detector
    from wtracker_tpu.ops.image import crop_views
    from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
    from wtracker_tpu.sim.engine import EngineParams
    from wtracker_tpu.utils.frame_reader import FrameReader

    timing = TimingConfig.load_json(args.timing_config)
    exp = ExperimentConfig.load_json(args.exp_config)
    reader = FrameReader.create_from_directory(args.frames)
    params = EngineParams.from_timing(timing, reader.frame_size)
    H, W = reader.frame_size

    n = min(args.calib_frames, len(reader))
    idxs = np.unique(np.linspace(0, len(reader) - 1, n).astype(int))

    if args.bboxes_csv:
        import pandas as pd

        log = pd.read_csv(args.bboxes_csv).set_index("frame")
        rows = log.reindex(idxs).ffill().bfill()  # tail frames past the log reuse its last window
        tls = rows[["cam_x", "cam_y"]].to_numpy(np.float32)
    else:
        tl = np.array([exp.init_position[0] - params.cam_w // 2, exp.init_position[1] - params.cam_h // 2])
        tls = np.tile(tl.astype(np.float32), (len(idxs), 1))
    tls[:, 0] = np.clip(tls[:, 0], 0, W - params.cam_w)
    tls[:, 1] = np.clip(tls[:, 1], 0, H - params.cam_h)
    tls = np.round(tls).astype(np.int32)

    frames = reader.read_batch(idxs)
    views = np.asarray(crop_views(jnp.asarray(frames), jnp.asarray(tls), (params.cam_h, params.cam_w)))

    det = YoloV8Detector.load(args.detector, imgsz=args.imgsz).fuse()
    q = quantize_detector(det.model, det.variables, views, (args.imgsz, args.imgsz))
    q.save(args.output)
    print(
        f"wrote {args.output}: int8 {q.scale}-scale detector, "
        f"{len(q.qweights)} quantized convs, calibrated on {len(views)} views"
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Initialize an experiment from raw frames (reference: initialize_experiment.ipynb).

Computes the background, runs the detector (YOLO or the classical bootstrap)
over every frame, and writes ``init_bboxes.csv`` + ``background.npy`` +
``exp_config.json`` — the artifacts every later simulation replays from.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", required=True, help="directory of frame images")
    ap.add_argument("--output", required=True, help="output experiment folder")
    ap.add_argument("--name", default="exp")
    ap.add_argument("--fps", type=float, default=60.0)
    ap.add_argument("--px-per-mm", type=float, default=90.0)
    ap.add_argument("--init-position", type=int, nargs=2, default=None, help="platform start (x y)")
    ap.add_argument("--detector", default="classical", choices=["classical", "yolo"])
    ap.add_argument("--yolo-weights", help="detector weights (.npz or ultralytics .pt)")
    ap.add_argument("--imgsz", type=int, default=384)
    ap.add_argument("--bg-probes", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import numpy as np
    import pandas as pd

    from wtracker_tpu.dataset import BGExtractor, BoxCalculator
    from wtracker_tpu.sim.config import ExperimentConfig
    from wtracker_tpu.utils.frame_reader import FrameReader
    from wtracker_tpu.utils.path_utils import create_directory, join_paths

    reader = FrameReader.create_from_directory(args.frames)
    create_directory(args.output)

    print(f"{len(reader)} frames @ {reader.frame_size}")
    bg = BGExtractor(reader).calc_background(args.bg_probes)
    np.save(join_paths(args.output, "background.npy"), bg)

    if args.detector == "classical":
        calc = BoxCalculator(reader, bg)
        boxes = calc.calc_all_boxes(chunk_size=args.batch).astype(float)
        boxes[boxes[:, 2] <= 0] = np.nan  # no blob -> NaN protocol
    else:
        from wtracker_tpu.models.yolov8 import YoloV8Detector

        det = YoloV8Detector.load(args.yolo_weights, imgsz=args.imgsz)
        boxes = np.empty((len(reader), 4))
        for s in range(0, len(reader), args.batch):
            idx = range(s, min(s + args.batch, len(reader)))
            boxes[list(idx)] = np.asarray(det.detect(reader.read_batch(idx)))

    pd.DataFrame(boxes, columns=["wrm_x", "wrm_y", "wrm_w", "wrm_h"]).to_csv(
        join_paths(args.output, "init_bboxes.csv"), index=False
    )

    finite = np.isfinite(boxes).all(axis=1)
    if args.init_position is None:
        first = boxes[np.argmax(finite)]
        args.init_position = [int(first[0] + first[2] / 2), int(first[1] + first[3] / 2)]

    exp = ExperimentConfig.from_frame_reader(
        reader,
        name=args.name,
        frames_per_sec=args.fps,
        px_per_mm=args.px_per_mm,
        init_position=tuple(args.init_position),
    )
    exp.save_json(join_paths(args.output, "exp_config.json"))
    print(
        f"wrote init_bboxes.csv ({int(finite.sum())}/{len(boxes)} detections), "
        f"background.npy, exp_config.json -> {args.output}"
    )


if __name__ == "__main__":
    main()

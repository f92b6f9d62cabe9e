#!/usr/bin/env python
"""Create a YOLO training dataset from raw frames (reference: create_yolo_images.ipynb).

Classical bootstrap: background extraction → blob detection → fixed-size crops
saved for annotation / training.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", required=True, help="directory of frame images")
    ap.add_argument("--output", required=True, help="sample output folder")
    ap.add_argument("--count", type=int, default=500, help="number of samples (0 = all frames)")
    ap.add_argument("--size", type=int, nargs=2, default=[384, 384], help="crop size (w h)")
    ap.add_argument("--bg-probes", type=int, default=500)
    ap.add_argument("--diff-thresh", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from wtracker_tpu.dataset import BGExtractor, BoxCalculator, SampleExtractor
    from wtracker_tpu.utils.frame_reader import FrameReader

    reader = FrameReader.create_from_directory(args.frames)
    bg = BGExtractor(reader).calc_background(args.bg_probes)
    calc = BoxCalculator(reader, bg, diff_thresh=args.diff_thresh)
    extractor = SampleExtractor(calc)

    if args.count:
        extractor.create_samples(args.count, tuple(args.size), args.output, seed=args.seed)
    else:
        extractor.create_all_samples(tuple(args.size), args.output, seed=args.seed)
    print(f"samples written to {args.output}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Replay a simulation log with overlays (reference: visualize.ipynb).

Headless by default: exports annotated frames and/or an mp4.  ``--play`` opens
the interactive window (requires a display).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--timing-config", required=True)
    ap.add_argument("--log", required=True, help="bboxes.csv")
    ap.add_argument("--frames", help="directory of frame images (white frames if omitted)")
    ap.add_argument("--cam-type", default="plt", choices=["plt", "cam", "mic"])
    ap.add_argument("--video", help="write an mp4 here")
    ap.add_argument("--save-frames", help="write annotated frames to this folder")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--stop", type=int, default=None)
    ap.add_argument("--play", action="store_true", help="interactive window")
    args = ap.parse_args()

    from wtracker_tpu.eval import VLC
    from wtracker_tpu.sim.config import TimingConfig
    from wtracker_tpu.utils.frame_reader import FrameReader

    timing = TimingConfig.load_json(args.timing_config)
    files = None
    if args.frames:
        reader = FrameReader.create_from_directory(args.frames)
        files = [f"{reader.root_folder}/{f}" for f in reader.files]

    vlc = VLC(files=files, config=timing, log_path=args.log, cam_type=args.cam_type, show_cam=True)

    if args.video:
        vlc.make_video(args.video, start=args.start, stop=args.stop)
        print(f"wrote {args.video}")
    if args.save_frames:
        vlc.save_frames(args.save_frames, start=args.start, stop=args.stop or len(vlc))
        print(f"wrote frames to {args.save_frames}")
    if args.play:
        vlc.play()


if __name__ == "__main__":
    main()

"""Synthetic worm trajectories + shared config kwargs for parity tests."""

from __future__ import annotations

import numpy as np
import pandas as pd

EXP_KWARGS = dict(
    name="synt",
    num_frames=480,
    frames_per_sec=60,
    orig_resolution=(500, 600),  # (h, w)
    px_per_mm=90,
    init_position=(300, 250),
)

TIMING_KWARGS = dict(
    imaging_time_ms=75.0,   # ceil(75/16.67)  = 5 frames
    pred_time_ms=30.0,      # ceil(30/16.67)  = 2 frames
    moving_time_ms=50.0,    # ceil(50/16.67)  = 3 frames
    camera_size_mm=(1.2, 1.1),   # round -> (108, 99) px
    micro_size_mm=(0.25, 0.25),  # round -> (22, 22) px
)


def make_worm_csv(path: str, num_frames: int = 480, seed: int = 7, nan_every: int = 37) -> pd.DataFrame:
    """Random-walk worm bboxes around the arena, with periodic NaN dropouts."""
    rng = np.random.default_rng(seed)
    pos = np.empty((num_frames, 2))
    pos[0] = (300.0, 250.0)
    steps = rng.normal(0, 1.2, size=(num_frames - 1, 2)) + 0.35  # drift
    pos[1:] = pos[0] + np.cumsum(steps, axis=0)
    pos[:, 0] = np.clip(pos[:, 0], 20, 580)
    pos[:, 1] = np.clip(pos[:, 1], 20, 480)

    w = rng.uniform(8, 14, size=num_frames)
    h = rng.uniform(8, 14, size=num_frames)
    boxes = np.stack([pos[:, 0] - w / 2, pos[:, 1] - h / 2, w, h], axis=1)
    if nan_every:
        boxes[::nan_every] = np.nan

    df = pd.DataFrame(boxes, columns=["wrm_x", "wrm_y", "wrm_w", "wrm_h"])
    df.to_csv(path, index=False)
    return df

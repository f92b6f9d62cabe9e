"""Ground-truth playback controller: replay worm bboxes from a logged CSV.

Capability parity with the reference ``wtracker/sim/sim_controllers/
csv_controller.py:11-73``.  This is both the deterministic replay harness
(decoupling controller logic from live detection) and the base class of the
Polyfit/MLP/Optimal controllers.

Invariants preserved:
* out-of-range frame queries yield NaN bboxes (csv_controller.py:32-34);
* ``relative=True`` subtracts the camera bbox recorded at the same cycle step
  (valid because the platform is stationary during imaging);
* an unavailable prediction yields a (0, 0) move (csv_controller.py:58-59).
"""

from __future__ import annotations

from collections import deque
from typing import Collection

import numpy as np
import pandas as pd

from wtracker_tpu.sim.config import TimingConfig
from wtracker_tpu.sim.simulator import SimController, Simulator
from wtracker_tpu.utils import bbox as bb

WORM_COLS = ["wrm_x", "wrm_y", "wrm_w", "wrm_h"]


class CsvController(SimController):
    """Replays worm detections from ``csv_path`` as the tracking signal."""

    def __init__(self, timing_config: TimingConfig, csv_path: str):
        super().__init__(timing_config)
        self.csv_path = csv_path
        self._csv_data = pd.read_csv(csv_path, usecols=WORM_COLS)[WORM_COLS].to_numpy(dtype=float)
        self._camera_bboxes: deque = deque(maxlen=timing_config.cycle_frame_num)

    def on_sim_start(self, sim: Simulator) -> None:
        self._camera_bboxes.clear()

    def on_camera_frame(self, sim: Simulator) -> None:
        self._camera_bboxes.append(sim.view.camera_position)

    def predict(self, frame_nums: Collection[int], relative: bool = True) -> np.ndarray:
        """Worm bboxes for ``frame_nums``; NaN rows for out-of-range frames.

        With ``relative=True`` coordinates are shifted into the camera view of
        the matching cycle step (only valid for frames within the last cycle).
        """
        assert len(frame_nums) > 0
        frame_nums = np.asarray(frame_nums, dtype=int)

        valid = (frame_nums >= 0) & (frame_nums < self._csv_data.shape[0])
        worm_bboxes = np.full((frame_nums.shape[0], 4), np.nan)
        worm_bboxes[valid] = self._csv_data[frame_nums[valid], :]

        if not relative:
            return worm_bboxes

        cycle_len = self.timing_config.cycle_frame_num
        cam_bboxes = np.asarray(
            [self._camera_bboxes[n % cycle_len] for n in frame_nums], dtype=float
        )
        worm_bboxes[:, 0] -= cam_bboxes[:, 0]
        worm_bboxes[:, 1] -= cam_bboxes[:, 1]
        return worm_bboxes

    def begin_movement_prediction(self, sim: Simulator) -> None:
        pass

    def provide_movement_vector(self, sim: Simulator) -> tuple[int, int]:
        bbox = self.predict([sim.frame_number - self.timing_config.pred_frame_num])[0]
        if not np.isfinite(bbox).all():
            return 0, 0

        cx, cy = bb.center(bbox)
        cam_w, cam_h = sim.view.camera_size
        return round(cx - cam_w / 2), round(cy - cam_h / 2)

    def _cycle_predict_all(self, sim: Simulator) -> np.ndarray:
        cycle_len = self.timing_config.cycle_frame_num
        start = (sim.cycle_number - 1) * cycle_len
        end = min(start + cycle_len, len(self._csv_data))
        return self.predict(np.arange(start, end))

"""Oracle controller: move to the median ground-truth position of the next
imaging phase.

Capability parity with the reference ``wtracker/sim/sim_controllers/
optimal_controller.py:8-32``.  This is the upper bound on achievable tracking —
it peeks at the *future* trajectory, so its error is the floor every real
controller is measured against.
"""

from __future__ import annotations

import numpy as np

from wtracker_tpu.sim.config import TimingConfig
from wtracker_tpu.sim.controllers.csv import CsvController
from wtracker_tpu.sim.simulator import Simulator


class OptimalController(CsvController):
    def __init__(self, timing_config: TimingConfig, csv_path: str):
        super().__init__(timing_config, csv_path)
        self._csv_centers = self._csv_data[:, :2] + self._csv_data[:, 2:] / 2

    def provide_movement_vector(self, sim: Simulator) -> tuple[int, int]:
        timing = self.timing_config
        start = (sim.cycle_number + 1) * timing.cycle_frame_num
        end = start + timing.imaging_frame_num

        next_imaging = self._csv_centers[start:end, :]
        next_imaging = next_imaging[np.isfinite(next_imaging).all(axis=1)]
        if len(next_imaging) == 0:
            return 0, 0

        x_next, y_next = np.median(next_imaging, axis=0)

        cam_x, cam_y, cam_w, cam_h = sim.view.camera_position
        return round(x_next - (cam_x + cam_w / 2)), round(y_next - (cam_y + cam_h / 2))

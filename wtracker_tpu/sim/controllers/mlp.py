"""Neural movement controller driven by a Flax :class:`WormPredictor`.

Capability parity with the reference ``wtracker/sim/sim_controllers/
mlp_controllers.py:14-71``.

Invariants preserved:
* inputs are worm bboxes at ``io_config.input_frames`` offsets anchored at the
  prediction kickoff frame (``frame_number − pred_frame_num``);
* coordinates are re-based to the first input bbox before inference
  (mlp_controllers.py:49-56);
* the model's predicted displacement is clipped to the worm's max plausible
  speed, then combined with the worm's position relative to the camera center
  (mlp_controllers.py:32-34, 59-68);
* any non-finite input yields a (0, 0) move.
"""

from __future__ import annotations

import numpy as np

from wtracker_tpu.models.resmlp import WormPredictor
from wtracker_tpu.neural.config import IOConfig
from wtracker_tpu.sim.config import TimingConfig
from wtracker_tpu.sim.controllers.csv import CsvController
from wtracker_tpu.sim.simulator import Simulator
from wtracker_tpu.utils import bbox as bb


class MLPController(CsvController):
    """Predicts the worm's future displacement with a ResMLP on TPU.

    Args:
        timing_config: simulation timing.
        csv_path: detection log feeding the input features.
        model: a :class:`WormPredictor` (Flax model + IO contract).
        max_speed: max worm speed in mm/s; predictions are clipped accordingly.
    """

    def __init__(self, timing_config: TimingConfig, csv_path: str, model: WormPredictor, max_speed: float = 0.9):
        super().__init__(timing_config, csv_path)
        self.model = model
        self.io_config: IOConfig = model.io_config

        max_speed_px_frame = max_speed * (timing_config.px_per_mm / timing_config.frames_per_sec)
        self.max_dist_per_pred = max_speed_px_frame * self.io_config.pred_frames[0]

    def provide_movement_vector(self, sim: Simulator) -> tuple[int, int]:
        kickoff = sim.frame_number - self.timing_config.pred_frame_num
        sample_frames = kickoff + np.asarray(self.io_config.input_frames, dtype=int)

        boxes = self.predict(sample_frames, relative=False)
        if not np.isfinite(boxes).all():
            return 0, 0

        # anchor = the first input bbox corner relative to the camera center
        # (corner, not center — consistent with the dataset's feature re-base)
        cam_center = bb.center(np.asarray(sim.view.camera_position, dtype=float))
        origin = boxes[0, :2].copy()
        anchor = origin - cam_center

        # feature layout: all coordinates re-based to the first input bbox
        feats = boxes
        feats[:, :2] -= origin
        displacement = np.asarray(self.model(feats.reshape(1, -1))).ravel()
        displacement = np.clip(displacement, -self.max_dist_per_pred, self.max_dist_per_pred)

        move = displacement[:2] + anchor
        return round(move[0].item()), round(move[1].item())

    def print_model(self) -> None:
        self.model.print_model()

"""Live-detection controller: YOLO worm-head detection in the closed loop.

Capability parity with the reference ``wtracker/sim/sim_controllers/
yolo_controller.py`` — ``YoloConfig`` (15-45) and ``YoloController`` (48-109).
The detector here is the from-scratch Flax YOLOv8
(:mod:`wtracker_tpu.models.yolov8`) running on TPU instead of ultralytics.

Invariants preserved:
* camera frames are buffered per cycle and batch-predicted for logging
  (``_cycle_predict_all`` runs the detector on every frame of the cycle);
* the movement decision uses the frame captured ``pred_frame_num`` frames ago
  (modelling inference latency, yolo_controller.py:95-97);
* no detection ⇒ NaN bbox ⇒ (0, 0) move;
* ``max_det=1`` — the top-scoring box only (score argmax, no full NMS needed).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Any, Collection

import numpy as np

from wtracker_tpu.sim.config import TimingConfig
from wtracker_tpu.sim.simulator import SimController, Simulator
from wtracker_tpu.utils.config_base import ConfigBase


@dataclass
class YoloConfig(ConfigBase):
    model_path: str
    """Path to the detector weights (.npz Flax export, or a reference
    ultralytics .pt to be ported)."""

    device: str = "tpu"
    verbose: bool = False

    pred_kwargs: dict = field(
        default_factory=lambda: {
            "imgsz": 384,
            "conf": 0.1,
        }
    )
    """Inference settings: image size and confidence threshold."""

    model: Any = field(default=None, init=False, repr=False)

    def __getstate__(self) -> dict[str, Any]:
        state = self.__dict__.copy()
        state["model"] = None  # never serialize the live model
        return state

    def load_model(self):
        """Build (or return the cached) TPU detector for these settings."""
        if self.model is None:
            from wtracker_tpu.models.yolov8 import YoloV8Detector

            self.model = YoloV8Detector.load(
                self.model_path,
                imgsz=self.pred_kwargs.get("imgsz", 384),
                conf=self.pred_kwargs.get("conf", 0.1),
            )
        return self.model


class YoloController(SimController):
    """Closes the loop with live TPU detection on buffered camera frames."""

    def __init__(self, timing_config: TimingConfig, yolo_config: YoloConfig):
        super().__init__(timing_config)
        self.yolo_config = yolo_config
        self._camera_frames: deque = deque(maxlen=timing_config.cycle_frame_num)
        self._model = yolo_config.load_model()

    def on_sim_start(self, sim: Simulator) -> None:
        self._camera_frames.clear()

    def on_camera_frame(self, sim: Simulator) -> None:
        self._camera_frames.append(sim.camera_view())

    def on_cycle_end(self, sim: Simulator) -> None:
        self._camera_frames.clear()

    def predict(self, frames: Collection[np.ndarray]) -> np.ndarray:
        """Detect the worm head in each frame; (N, 4) xywh with NaN rows for
        frames without a detection."""
        assert len(frames) > 0
        batch = np.stack(list(frames), axis=0)
        return np.array(self._model.detect(batch))  # writable host copy

    def begin_movement_prediction(self, sim: Simulator) -> None:
        pass

    def provide_movement_vector(self, sim: Simulator) -> tuple[int, int]:
        # decide on the frame captured pred_frame_num frames ago — modelling
        # real inference latency (yolo_controller.py:95-97)
        decision_frame = self._camera_frames[-self.timing_config.pred_frame_num]
        (bbox,) = self.predict([decision_frame])
        if not np.isfinite(bbox).all():
            return 0, 0

        offset = (bbox[:2] + bbox[2:] / 2) - np.asarray(sim.view.camera_size, dtype=float) / 2
        return round(offset[0]), round(offset[1])

    def _cycle_predict_all(self, sim: Simulator) -> np.ndarray:
        return self.predict(self._camera_frames)

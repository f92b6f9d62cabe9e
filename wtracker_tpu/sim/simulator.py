"""The closed-loop microscope-platform simulator (host event loop + hook ABC).

Capability parity with the reference ``wtracker/sim/simulator.py`` —
``Simulator`` (12-194, run loop 140-194) and the 12-hook ``SimController`` ABC
(197-293).

This host implementation preserves the exact per-frame hook schedule
(SURVEY.md §7 item 3):

* cycle start: ``on_movement_end``/``on_cycle_end`` (cycles > 0) then
  ``on_cycle_start``;
* every frame: ``on_camera_frame``;
* ``cycle_step == 0``: ``on_imaging_start``;
* ``cycle_step < imaging_frame_num``: ``on_micro_frame``;
* ``cycle_step == imaging_frame_num − pred_frame_num``:
  ``begin_movement_prediction`` (models real inference latency);
* ``cycle_step == imaging_frame_num``: ``on_imaging_end``, the controller's
  ``provide_movement_vector``, ``on_movement_start``, motor registration;
* moving phase: one motor step per frame applied to the view position.

The TPU-native counterpart — the cycle-level ``lax.scan`` engine producing
identical logs — lives in :mod:`wtracker_tpu.sim.engine`.
"""

from __future__ import annotations

import abc

import numpy as np
from tqdm.auto import tqdm

from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
from wtracker_tpu.sim.motor import MotorController, SineMotorController
from wtracker_tpu.sim.view import ViewController
from wtracker_tpu.utils.frame_reader import DummyReader, FrameReader


class Simulator:
    """Drives the frame-by-frame closed loop and dispatches controller hooks.

    Args:
        timing_config: cycle timing / view sizes.
        experiment_config: per-experiment parameters.
        sim_controller: the tracking controller under simulation.
        reader: frame source; headless mode (``None``) uses white dummy frames
            at the padded resolution so that view geometry is unchanged.
        motor_controller: platform motor; default is the sine-profile motor.
    """

    def __init__(
        self,
        timing_config: TimingConfig,
        experiment_config: ExperimentConfig,
        sim_controller: "SimController",
        reader: FrameReader | None = None,
        motor_controller: MotorController | None = None,
    ) -> None:
        self.timing_config = timing_config
        self.experiment_config = experiment_config
        self._sim_controller = sim_controller

        if reader is None:
            padding = (timing_config.camera_size_px[0] // 2 * 2, timing_config.camera_size_px[1] // 2 * 2)
            resolution = tuple(o + p for o, p in zip(experiment_config.orig_resolution, padding))
            reader = DummyReader(experiment_config.num_frames, resolution, colored=True)

        self._motor_controller = motor_controller if motor_controller is not None else SineMotorController(timing_config)

        self._view = ViewController(
            frame_reader=reader,
            camera_size=timing_config.camera_size_px,
            micro_size=timing_config.micro_size_px,
            init_position=experiment_config.init_position,
        )

    @property
    def view(self) -> ViewController:
        return self._view

    @property
    def position(self) -> tuple[int, int]:
        """Current platform-center position (x, y)."""
        return self._view.position

    @property
    def cycle_number(self) -> int:
        return self._view.index // self.timing_config.cycle_frame_num

    @property
    def frame_number(self) -> int:
        return self._view.index

    @property
    def cycle_step(self) -> int:
        """Frame index within the current cycle (0-based)."""
        return self._view.index % self.timing_config.cycle_frame_num

    def camera_view(self) -> np.ndarray:
        return self._view.camera_view()

    def micro_view(self) -> np.ndarray:
        return self._view.micro_view()

    def _reset(self) -> None:
        self.view.reset()
        self.view.set_position(*self.experiment_config.init_position)

    def run(self, visualize: bool = False, wait_key: bool = False, progress: bool = True) -> None:
        """Run the full simulation (all frames of the experiment)."""
        config = self.timing_config

        total_cycles = len(self._view) // config.cycle_frame_num
        pbar = tqdm(total=total_cycles, desc="Simulation Progress", unit="cycle", disable=not progress)

        self._reset()
        self._sim_controller.on_sim_start(self)

        while self._view.progress():
            if self.cycle_step == 0:
                if self.cycle_number > 0:
                    self._sim_controller.on_movement_end(self)
                    self._sim_controller.on_cycle_end(self)
                self._sim_controller.on_cycle_start(self)

            self._sim_controller.on_camera_frame(self)

            if self.cycle_step == 0:
                self._sim_controller.on_imaging_start(self)

            if self.cycle_step < config.imaging_frame_num:
                self._sim_controller.on_micro_frame(self)

            if self.cycle_step == config.imaging_frame_num - config.pred_frame_num:
                self._sim_controller.begin_movement_prediction(self)

            if self.cycle_step == config.imaging_frame_num:
                self._sim_controller.on_imaging_end(self)
                dx, dy = self._sim_controller.provide_movement_vector(self)
                self._sim_controller.on_movement_start(self)
                self._motor_controller.register_move(dx, dy)

            if config.imaging_frame_num <= self.cycle_step < config.imaging_frame_num + config.moving_frame_num:
                dx, dy = self._motor_controller.step()
                self._view.move_position(dx, dy)

            if self.cycle_step == config.cycle_frame_num - 1:
                pbar.update(1)

            if visualize:
                self._view.visualize_world(timeout=0 if wait_key else 1)

        self._sim_controller.on_sim_end(self)
        pbar.close()


class SimController(abc.ABC):
    """Lifecycle-hook interface for tracking controllers.

    Subclasses implement the three abstract decision methods; the remaining
    hooks default to no-ops.  See the module docstring for the exact schedule.
    """

    def __init__(self, timing_config: TimingConfig):
        self.timing_config = timing_config

    def on_sim_start(self, sim: Simulator) -> None:
        """Called once before the first frame."""

    def on_sim_end(self, sim: Simulator) -> None:
        """Called once after the last frame."""

    def on_cycle_start(self, sim: Simulator) -> None:
        """Called at the first frame of every cycle."""

    def on_cycle_end(self, sim: Simulator) -> None:
        """Called when a cycle ends (before the next one starts)."""

    def on_camera_frame(self, sim: Simulator) -> None:
        """Called on every frame."""

    def on_imaging_start(self, sim: Simulator) -> None:
        """Called when the imaging phase starts."""

    def on_micro_frame(self, sim: Simulator) -> None:
        """Called on every frame of the imaging phase."""

    def on_imaging_end(self, sim: Simulator) -> None:
        """Called when the imaging phase ends."""

    def on_movement_start(self, sim: Simulator) -> None:
        """Called when the movement phase starts."""

    def on_movement_end(self, sim: Simulator) -> None:
        """Called when the movement phase ends."""

    @abc.abstractmethod
    def begin_movement_prediction(self, sim: Simulator) -> None:
        """Kick off the movement prediction (``pred_frame_num`` frames early)."""
        raise NotImplementedError()

    @abc.abstractmethod
    def provide_movement_vector(self, sim: Simulator) -> tuple[int, int]:
        """Return the (dx, dy) platform move decided for this cycle."""
        raise NotImplementedError()

    @abc.abstractmethod
    def _cycle_predict_all(self, sim: Simulator) -> np.ndarray:
        """Worm-bbox predictions for every frame of the just-finished cycle.

        Shape (cycle_frame_num, 4); NaN rows mean no prediction.  Used by the
        logging wrapper.
        """
        raise NotImplementedError()

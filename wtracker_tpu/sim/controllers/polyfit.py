"""Polynomial-extrapolation controller + offline weight evaluator.

Capability parity with the reference ``wtracker/sim/sim_controllers/
polyfit_controller.py`` — ``PolyfitConfig`` (13-32), ``PolyfitController``
(35-84) and ``WeightEvaluator`` (87-221).

Behavioral invariant (SURVEY.md §7 item 7): fit a weighted polynomial per axis
to worm centers sampled at ``sample_times`` (relative to cycle start) and
extrapolate to ``cycle_frame_num + imaging_frame_num // 2`` — the middle of the
*next* imaging phase.

The fit itself runs through :mod:`wtracker_tpu.ops.polyfit` — the same
column-scaled lstsq algorithm as ``numpy.polynomial`` but jit-compiled, with
zero-weight masking standing in for row deletion so the op is shape-stable for
the scan engine.  ``WeightEvaluator.eval`` is fully vectorized and jitted; the
PSO driving it lives in :mod:`wtracker_tpu.neural.optimize`.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import numpy.polynomial.polynomial as npoly
import pandas as pd

from functools import partial

import jax
import jax.numpy as jnp

from wtracker_tpu.ops.polyfit import polyfit, polyvander
from wtracker_tpu.sim.config import TimingConfig
from wtracker_tpu.sim.controllers.csv import WORM_COLS, CsvController
from wtracker_tpu.sim.simulator import Simulator
from wtracker_tpu.utils import bbox as bb
from wtracker_tpu.utils.config_base import ConfigBase


@partial(jax.jit, static_argnames=("deg",))
def _weight_eval_mae(x_input, y_input, weights, x_target, y_target, deg):
    coeffs = polyfit(x_input, y_input, deg=deg, w=weights)  # (deg+1, M)
    van = polyvander(jnp.asarray(x_target, dtype=jnp.float64), deg)  # (M, deg+1)
    y_pred = jnp.sum(van * coeffs.T, axis=-1)
    return jnp.mean(jnp.abs(y_target - y_pred))


@dataclass
class PolyfitConfig(ConfigBase):
    """Fit recipe: polynomial degree + sample grid + per-sample weights.

    Field schema matches the reference PolyfitConfig (saved JSONs round-trip);
    ``sample_times`` are frames relative to the cycle start (negatives reach
    into previous cycles) and are kept sorted; omitted weights mean uniform.
    """

    degree: int
    sample_times: list[int]
    weights: list[float] = None

    def __post_init__(self):
        self.sample_times = sorted(self.sample_times)
        if self.weights is None:
            self.weights = [1.0] * len(self.sample_times)
        assert len(self.weights) == len(self.sample_times)


class PolyfitController(CsvController):
    """Extrapolates the worm center with a weighted polynomial fit."""

    def __init__(
        self,
        timing_config: TimingConfig,
        polyfit_config: PolyfitConfig,
        csv_path: str,
    ) -> None:
        super().__init__(timing_config, csv_path)
        self.polyfit_config = polyfit_config
        self._sample_times = np.asarray(polyfit_config.sample_times, dtype=int)
        self._weights = np.asarray(polyfit_config.weights, dtype=float)

    def _sampled_track(self, sim: Simulator) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(times, centers, weights) of the finite samples for this cycle,
        with centers shifted into the current camera view."""
        query = sim.cycle_number * self.timing_config.cycle_frame_num + self._sample_times
        boxes = self.predict(query, relative=False)
        boxes[:, :2] -= np.asarray(sim.view.camera_position[:2])

        centers = bb.center(boxes)
        ok = np.isfinite(centers).all(axis=1)
        return self._sample_times[ok], centers[ok], self._weights[ok]

    def provide_movement_vector(self, sim: Simulator) -> tuple[int, int]:
        timing = self.timing_config
        times, centers, weights = self._sampled_track(sim)
        if times.size == 0:
            return 0, 0

        # Host path: numpy's own polynomial fit (what the reference calls) for
        # bit-exact log parity.  The scan engine uses the jitted TPU-safe
        # equivalent in ops.polyfit instead.
        horizon = timing.cycle_frame_num + timing.imaging_frame_num // 2
        coeffs = npoly.polyfit(times, centers, deg=self.polyfit_config.degree, w=weights)
        future = npoly.polyval(horizon, coeffs)

        half_cam = np.asarray(sim.view.camera_size, dtype=float) / 2
        return round(future[0] - half_cam[0]), round(future[1] - half_cam[1])


class WeightEvaluator:
    """Mean-absolute-error objective for tuning polyfit sample weights.

    Builds (input positions, target position) pairs for every cycle of the
    given logs — filtered by validity and a speed band — then evaluates any
    candidate weight vector with one jitted batched fit.

    Args:
        csv_paths: logs holding the worm trajectory.
        timing_config: timing configuration of the simulation.
        input_time_offsets: sample times relative to each cycle start.
        pred_time_offset: target time relative to each cycle start.
        min_speed / max_speed: average-speed band for cycles to count.
    """

    def __init__(
        self,
        csv_paths: list[str],
        timing_config: TimingConfig,
        input_time_offsets: np.ndarray,
        pred_time_offset: int,
        min_speed: float = 0,
        max_speed: float = np.inf,
    ):
        self.csv_paths = list(csv_paths)
        self.timing_config = timing_config
        self.input_time_offsets = np.sort(input_time_offsets)
        self.pred_time_offset = pred_time_offset
        self.min_speed = min_speed
        self.max_speed = max_speed

        per_log = [self._load_log_pairs(i, p) for i, p in enumerate(self.csv_paths)]
        self.x_input = self.input_time_offsets.reshape(-1)
        self.y_input = np.concatenate([inp for inp, _ in per_log], axis=1)
        self.y_target = np.concatenate([tgt for _, tgt in per_log], axis=0)
        self.x_target = np.full_like(self.y_target, self.pred_time_offset)

    def _load_log_pairs(self, log_idx: int, path: str) -> tuple[np.ndarray, np.ndarray]:
        """Read one log and extract its (inputs, target) pairs, reporting how
        much of it survived the validity/speed filters."""
        cycle_len = self.timing_config.cycle_frame_num
        track = pd.read_csv(path, usecols=WORM_COLS)[WORM_COLS].to_numpy(dtype=float)
        inp, tgt = self._extract_positions(track, cycle_len)

        total = len(track) // cycle_len
        kept = len(tgt) // 2
        pct = round((total - kept) / total * 100, 1) if total else 0.0
        print(f"Log {log_idx} :: Number of evaluation cycles: {kept}")
        print(f"Log {log_idx} :: Number of cycles removed: {total - kept} ({pct} %)")
        return inp, tgt

    def _extract_positions(self, raw_bboxes: np.ndarray, cycle_length: int) -> tuple[np.ndarray, np.ndarray]:
        """Per-cycle (inputs, target) center positions, filtered for validity/speed.

        Returns ``y_input`` shaped (N, 2 * n_cycles) — x/y coordinates of each
        kept cycle stacked along axis 1 — and ``y_target`` flattened to
        (2 * n_cycles,), matching the reference layout for shared-abscissa
        multi-polynomial fitting.
        """
        n_inputs = self.input_time_offsets.shape[0]
        centers = bb.center(raw_bboxes)

        cycle_starts = np.arange(0, raw_bboxes.shape[0], cycle_length, dtype=int)
        t_input = cycle_starts[:, None] + self.input_time_offsets[None, :]
        t_target = cycle_starts + self.pred_time_offset

        ok = (t_input >= 0).all(axis=1) & (t_target < len(centers))
        t_input, t_target = t_input[ok], t_target[ok]

        y_input = centers[t_input.reshape(-1), :].reshape(-1, n_inputs, 2)
        y_target = centers[t_target, :]

        finite = np.isfinite(y_input).all(axis=(1, 2)) & np.isfinite(y_target).all(axis=1)
        y_input, y_target = y_input[finite], y_target[finite]

        # speed band: average speed from the first input sample to the target
        dist = np.linalg.norm(y_target - y_input[:, 0, :], axis=1)
        time = self.pred_time_offset - self.input_time_offsets[0]
        speed = dist / time
        keep = (speed >= self.min_speed) & (speed <= self.max_speed)
        y_input, y_target = y_input[keep], y_target[keep]

        return y_input.swapaxes(0, 1).reshape(n_inputs, -1), y_target.reshape(-1)

    def eval(self, weights: np.ndarray, deg: int = 2) -> float:
        """MAE of the weighted polynomial fit over the whole dataset.

        Each of the M columns of ``y_input`` gets its own polynomial (shared
        abscissa); polynomial i is evaluated at its own target time — a
        row-wise Vandermonde product, not a full cross. Jitted end to end.
        """
        mae = _weight_eval_mae(
            self.x_input.astype(float),
            self.y_input,
            np.asarray(weights, dtype=float),
            self.x_target.astype(float),
            self.y_target,
            deg,
        )
        return float(mae)

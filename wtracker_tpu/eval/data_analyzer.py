"""Post-hoc analysis of simulation logs.

Capability parity with the reference ``wtracker/eval/data_analyzer.py:12-416``:
column derivations (centers/speed/deviation/bbox error), cleaning (imaging-only,
bounds, cycle trimming), anomaly detection/removal, unit conversion
(frame/px ↔ sec/µm), precise-error computation, and summary statistics.

Pandas on the host, like the reference — analysis is IO/metadata bound, and
parity of the derived columns matters more than device speed here.  The
precise-error pass additionally offers the batched device kernel
(``calc_precise_error(..., batched=True)``) which tiles worm crops and runs
the segmentation math in one fused op instead of a per-frame python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from wtracker_tpu.eval.error_calculator import ErrorCalculator
from wtracker_tpu.sim.config import TimingConfig
from wtracker_tpu.utils import bbox as bb
from wtracker_tpu.utils.bbox import BoxFormat
from wtracker_tpu.utils.frame_reader import FrameReader


class DataAnalyzer:
    """Analyzes a single experiment log (one bboxes.csv)."""

    def __init__(self, time_config: TimingConfig, log_data: pd.DataFrame):
        self.time_config = time_config
        self.data = log_data.copy()
        self._orig_data = log_data
        self._unit = "frame"

    @property
    def unit(self) -> str:
        return self._unit

    def save(self, path: str) -> None:
        """Persist the full (analyzed) data."""
        self._orig_data.to_csv(path, index=False)

    @staticmethod
    def load(time_config: TimingConfig, csv_path: str) -> "DataAnalyzer":
        """Create an analyzer from a log CSV (analyzed or raw)."""
        return DataAnalyzer(time_config, pd.read_csv(csv_path))

    def initialize(self, period: int = 10) -> None:
        """Derive the analysis columns; call once on raw log data.

        Args:
            period: span (in frames) over which speed is measured.
        """
        data = self._orig_data
        data["time"] = data["frame"]
        data["cycle_step"] = data["frame"] % self.time_config.cycle_frame_num

        data = self._calc_centers(data)
        data = self._calc_speed(data, period)
        data = self._calc_worm_deviation(data)
        data = self._calc_errors(data)
        data = data.round(5)

        self._orig_data = data
        self.data = self._orig_data.copy()

    @staticmethod
    def _calc_centers(data: pd.DataFrame) -> pd.DataFrame:
        data["wrm_center_x"] = data["wrm_x"] + data["wrm_w"] / 2
        data["wrm_center_y"] = data["wrm_y"] + data["wrm_h"] / 2
        data["mic_center_x"] = data["mic_x"] + data["mic_w"] / 2
        data["mic_center_y"] = data["mic_y"] + data["mic_h"] / 2
        return data

    @staticmethod
    def _calc_speed(data: pd.DataFrame, n: int) -> pd.DataFrame:
        diff = data["time"].diff(n).to_numpy()
        data["wrm_speed_x"] = data["wrm_center_x"].diff(n) / diff
        data["wrm_speed_y"] = data["wrm_center_y"].diff(n) / diff
        data["wrm_speed"] = np.sqrt(data["wrm_speed_x"] ** 2 + data["wrm_speed_y"] ** 2)
        return data

    @staticmethod
    def _calc_worm_deviation(data: pd.DataFrame) -> pd.DataFrame:
        data["worm_deviation_x"] = data["wrm_center_x"] - data["mic_center_x"]
        data["worm_deviation_y"] = data["wrm_center_y"] - data["mic_center_y"]
        data["worm_deviation"] = np.sqrt(data["worm_deviation_x"] ** 2 + data["worm_deviation_y"] ** 2)
        return data

    @staticmethod
    def _calc_errors(data: pd.DataFrame) -> pd.DataFrame:
        wrm = data[["wrm_x", "wrm_y", "wrm_w", "wrm_h"]].to_numpy()
        mic = data[["mic_x", "mic_y", "mic_w", "mic_h"]].to_numpy()
        data["bbox_error"] = ErrorCalculator.calculate_bbox_error(wrm, mic)
        data["precise_error"] = np.nan
        return data

    # -- filtering ---------------------------------------------------------

    def remove_cycle(self, cycles: int | list[int]) -> None:
        """Drop the given cycle(s) from the working data."""
        if isinstance(cycles, int):
            cycles = [cycles]
        self.data = self.data[~self.data["cycle"].isin(cycles)]

    def clean(
        self,
        trim_cycles: bool = False,
        imaging_only: bool = False,
        bounds: tuple[float, float, float, float] | None = None,
    ) -> None:
        """Filter rows: imaging phase only, inside arena bounds, trim the
        first/last cycles."""
        data = self.data

        if imaging_only:
            data = data[data["phase"] == "imaging"]

        if bounds is not None:
            wrm = data[["wrm_x", "wrm_y", "wrm_w", "wrm_h"]].to_numpy()
            has_pred = np.isfinite(wrm).all(axis=1)

            mask_wrm = has_pred.copy()
            mask_wrm &= (data["wrm_x"] >= bounds[0]) & (data["wrm_x"] + data["wrm_w"] <= bounds[2])
            mask_wrm &= (data["wrm_y"] >= bounds[1]) & (data["wrm_y"] + data["wrm_h"] <= bounds[3])

            mask_mic = ~has_pred
            mask_mic &= (data["mic_x"] >= bounds[0]) & (data["mic_x"] + data["mic_w"] <= bounds[2])
            mask_mic &= (data["mic_y"] >= bounds[1]) & (data["mic_y"] + data["mic_h"] <= bounds[3])

            data = data[mask_wrm | mask_mic]

        if trim_cycles:
            mask = data["cycle"] != 0
            mask &= data["cycle"] != data["cycle"].max()
            data = data[mask]

        self.data = data

    def reset_changes(self) -> None:
        """Restore the working data (unit resets to frames/px)."""
        self.data = self._orig_data.copy()
        self._unit = "frame"

    def column_names(self) -> list[str]:
        return self.data.columns.to_list()

    # -- unit conversion ---------------------------------------------------

    def change_unit(self, unit: str) -> None:
        """Convert between ("frame", px) and ("sec", µm) units."""
        assert unit in ["frame", "sec"]
        if self._unit == unit:
            return

        data = self.data
        if unit == "sec":
            dist_factor = self.time_config.mm_per_px * 1000
            time_factor = self.time_config.ms_per_frame / 1000
        else:
            dist_factor = self.time_config.px_per_mm / 1000
            time_factor = self.time_config.frames_per_sec

        data["time"] *= time_factor
        for cols in (
            ["plt_x", "plt_y"],
            ["wrm_x", "wrm_y", "wrm_w", "wrm_h"],
            ["mic_x", "mic_y", "mic_w", "mic_h"],
            ["cam_x", "cam_y", "cam_w", "cam_h"],
            ["wrm_center_x", "wrm_center_y"],
            ["mic_center_x", "mic_center_y"],
            ["worm_deviation_x", "worm_deviation_y", "worm_deviation"],
        ):
            data[cols] *= dist_factor
        data[["wrm_speed_x", "wrm_speed_y", "wrm_speed"]] *= dist_factor / time_factor

        self._unit = unit
        self.data = data

    # -- precise error -----------------------------------------------------

    def calc_precise_error(
        self,
        worm_reader: FrameReader,
        background: np.ndarray,
        diff_thresh: float = 20,
        batched: bool = False,
    ) -> None:
        """Compute the segmentation-based error for every frame of the log.

        Args:
            worm_reader: yields, per frame number, the worm view cropped to the
                discretized worm bbox of that frame.
            background: full-arena background image.
            diff_thresh: foreground threshold.
            batched: run the fused device kernel instead of the per-frame loop.
        """
        frames = self._orig_data["frame"].to_numpy().astype(np.int32, copy=False)
        wrm_bboxes = self._orig_data[["wrm_x", "wrm_y", "wrm_w", "wrm_h"]].to_numpy()
        mic_bboxes = self._orig_data[["mic_x", "mic_y", "mic_w", "mic_h"]].to_numpy()

        if batched:
            errors = self._precise_batched(background, wrm_bboxes, mic_bboxes, frames, worm_reader, diff_thresh)
        else:
            errors = ErrorCalculator.calculate_precise(
                background=background,
                worm_bboxes=wrm_bboxes,
                mic_bboxes=mic_bboxes,
                frame_nums=frames,
                worm_reader=worm_reader,
                diff_thresh=diff_thresh,
            )

        self._orig_data["precise_error"] = errors
        idx = self.data["frame"].to_numpy(dtype=int, copy=False)
        self.data["precise_error"] = errors[idx]

    def calc_precise_error_experimental(
        self,
        worm_reader: FrameReader,
        background: np.ndarray,
        diff_thresh: float = 20,
        num_workers: int | None = None,
        chunk_size: int = 2000,
    ) -> None:
        """API-parity alias of the reference's threaded variant
        (data_analyzer.py:218-287); here the batched device kernel replaces
        the thread pool outright (``num_workers``/``chunk_size`` accepted for
        compatibility)."""
        self.calc_precise_error(worm_reader, background, diff_thresh, batched=True)

    @staticmethod
    def _precise_batched(background, wrm_bboxes, mic_bboxes, frames, worm_reader, diff_thresh):
        from wtracker_tpu.eval.error_calculator import precise_error_batched

        bounds = background.shape[:2]
        wrm_d, is_legal = bb.discretize(wrm_bboxes, bounds=bounds, box_format=BoxFormat.XYWH)
        mic_d, _ = bb.discretize(mic_bboxes, bounds=bounds, box_format=BoxFormat.XYWH)

        errors = np.full(len(frames), np.nan)
        idx = np.flatnonzero(is_legal)
        if len(idx) == 0:
            return errors

        wrm_d, mic_d = wrm_d[idx], mic_d[idx]
        H = int(wrm_d[:, 3].max())
        W = int(wrm_d[:, 2].max())

        wrm_xyxy = bb.to_xyxy(wrm_d, BoxFormat.XYWH)
        mic_xyxy = bb.to_xyxy(mic_d, BoxFormat.XYWH)
        int_tl = np.maximum(wrm_xyxy[:, :2], mic_xyxy[:, :2])
        int_br = np.minimum(wrm_xyxy[:, 2:], mic_xyxy[:, 2:])
        int_wh = np.maximum(int_br - int_tl, 0)
        int_tlwh = np.concatenate([int_tl - wrm_xyxy[:, :2], int_wh], axis=1)

        chunk = 2048
        for s in range(0, len(idx), chunk):
            sel = slice(s, min(s + chunk, len(idx)))
            n = sel.stop - sel.start
            views = np.zeros((n, H, W), dtype=np.uint8)
            bgs = np.zeros((n, H, W), dtype=np.uint8)
            hw = np.zeros((n, 2), dtype=np.int32)
            for j in range(n):
                k = idx[sel][j]
                x, y, w, h = wrm_d[sel][j]
                view = worm_reader[int(frames[k])]
                views[j, :h, :w] = view[:h, :w]
                bgs[j, :h, :w] = background[y : y + h, x : x + w]
                hw[j] = (h, w)
            errors[idx[sel]] = np.asarray(
                precise_error_batched(views, bgs, hw, int_tlwh[sel], diff_thresh)
            )
        return errors

    # -- anomalies & stats -------------------------------------------------

    def calc_anomalies(
        self,
        no_preds: bool = True,
        min_bbox_error: float = np.inf,
        min_dist_error: float = np.inf,
        min_speed: float = np.inf,
        min_size: float = np.inf,
        remove_anomalies: bool = False,
    ) -> pd.DataFrame:
        """Flag (and optionally drop) outlier frames by several criteria."""
        data = self.data

        mask_speed = data["wrm_speed"] >= min_speed
        mask_bbox_error = data["bbox_error"] >= min_bbox_error
        mask_dist_error = data["worm_deviation"] >= min_dist_error
        mask_worm_width = data["wrm_w"] >= min_size
        mask_worm_height = data["wrm_h"] >= min_size

        wrm = data[["wrm_x", "wrm_y", "wrm_w", "wrm_h"]].to_numpy()
        mask_no_preds = no_preds & ~np.isfinite(wrm).all(axis=1)

        mask = (
            mask_speed | mask_bbox_error | mask_dist_error | mask_worm_width | mask_worm_height | mask_no_preds
        )

        anomalies = data[mask].copy()
        anomalies["speed_anomaly"] = mask_speed[mask]
        anomalies["bbox_error_anomaly"] = mask_bbox_error[mask]
        anomalies["dist_error_anomaly"] = mask_dist_error[mask]
        anomalies["width_anomaly"] = mask_worm_width[mask]
        anomalies["height_anomaly"] = mask_worm_height[mask]
        anomalies["no_pred_anomaly"] = mask_no_preds[mask]

        if remove_anomalies:
            self.data = self.data[~mask]
        return anomalies

    def describe(self, columns: list[str] | None = None, num: int = 3, percentiles: list[float] | None = None) -> pd.DataFrame:
        """Descriptive statistics of selected columns."""
        if columns is None:
            columns = self.column_names()
        if percentiles is None:
            percentiles = np.linspace(start=0, stop=1.0, num=num + 2)[1:-1]
        return self.data[columns].describe(percentiles)

    def print_stats(self) -> None:
        """Print removal/no-pred/cycle/imperfect-prediction statistics."""
        num_removed = len(self._orig_data.index) - len(self.data.index)
        print(f"Count of Removed Frames: {num_removed} ({round(100 * num_removed / len(self._orig_data.index), 3)}%)")

        no_preds = self.data[["wrm_x", "wrm_y", "wrm_w", "wrm_h"]].isna().any(axis=1).sum()
        print(f"Count of No-Pred Frames: {no_preds} ({round(100 * no_preds / len(self.data.index), 3)}%)")

        print(f"Total Num of Cycles: {self.data['cycle'].nunique()}")

        non_perfect = (self.data["bbox_error"] > 1e-7).sum() / len(self.data.index)
        print(f"Non Perfect Predictions: {round(100 * non_perfect, 3)}%")

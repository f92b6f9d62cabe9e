"""Eval-layer tests: error metrics vs the reference oracle, analyzer column
parity, batched precise-error kernel vs the loop, plotting/replay smoke."""

import numpy as np
import pandas as pd
import pytest

from tests.reference_harness import import_reference, make_reference_configs
from tests.synthetic import EXP_KWARGS, TIMING_KWARGS, make_worm_csv
from wtracker_tpu.eval.data_analyzer import DataAnalyzer
from wtracker_tpu.eval.error_calculator import ErrorCalculator
from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
from wtracker_tpu.utils.frame_reader import ArrayReader


@pytest.fixture(scope="module")
def sim_log(tmp_path_factory):
    """A real analyzed log produced by the simulator on a synthetic worm."""
    from wtracker_tpu.sim.controllers import CsvController, LogConfig, LoggingController
    from wtracker_tpu.sim.simulator import Simulator

    tmp = tmp_path_factory.mktemp("eval")
    worm_csv = str(tmp / "worm.csv")
    make_worm_csv(worm_csv)

    exp = ExperimentConfig(**EXP_KWARGS)
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    ctl = LoggingController(
        CsvController(timing, worm_csv), LogConfig(root_folder=str(tmp / "run"), save_err_view=False)
    )
    Simulator(timing, exp, ctl).run(progress=False)
    return str(tmp / "run" / "bboxes.csv"), timing


def test_bbox_and_mse_error_vs_reference(rng):
    import_reference()
    from wtracker.eval.error_calculator import ErrorCalculator as RefEC

    wrm = rng.uniform(0, 200, size=(256, 4))
    mic = rng.uniform(0, 200, size=(256, 4))
    wrm[:, 2:] = rng.uniform(1, 30, size=(256, 2))
    mic[:, 2:] = rng.uniform(1, 30, size=(256, 2))
    wrm[7] = 0  # zero-area worm box

    np.testing.assert_allclose(
        ErrorCalculator.calculate_bbox_error(wrm.copy(), mic.copy()),
        RefEC.calculate_bbox_error(wrm.copy(), mic.copy()),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        ErrorCalculator.calculate_mse_error(wrm.copy(), mic.copy()),
        RefEC.calculate_mse_error(wrm.copy(), mic.copy()),
        atol=1e-12,
    )


def _make_precise_fixture(rng, n=40, arena=(120, 140)):
    """Background, worm crops reader, and bbox arrays for precise error."""
    background = rng.integers(0, 40, size=arena, dtype=np.uint8)

    wrm = np.zeros((n, 4))
    mic = np.zeros((n, 4))
    frames = np.arange(n)
    crops = []
    max_h = max_w = 24
    views = np.zeros((n, max_h, max_w), dtype=np.uint8)

    for i in range(n):
        w, h = rng.integers(6, 20, size=2)
        x = rng.integers(0, arena[1] - w)
        y = rng.integers(0, arena[0] - h)
        wrm[i] = (x, y, w, h)
        mic[i] = (x + rng.integers(-6, 6), y + rng.integers(-6, 6), 15, 15)
        crop = background[y : y + h, x : x + w].copy()
        # paint a "worm" blob
        crop[h // 3 : 2 * h // 3, w // 3 : 2 * w // 3] += 100
        views[i, :h, :w] = crop
    wrm[3] = np.nan  # a missing detection

    class CropReader:
        def __getitem__(self, idx):
            h, w = int(wrm[idx, 3]) if np.isfinite(wrm[idx, 3]) else 0, 0
            x, y, w_, h_ = (int(v) for v in np.nan_to_num(wrm[idx]))
            return views[idx, :h_, :w_]

    return background, wrm, mic, frames, CropReader(), views


def test_precise_error_vs_reference(rng):
    """Matches the reference exactly when all boxes are legal.

    With illegal boxes present, the reference has an indexing bug
    (error_calculator.py:133-159: loop index ``i`` enumerates the *filtered*
    arrays but writes into the unfiltered ``errors``), misaligning every error
    after the first illegal bbox.  We deliberately fix the alignment; the
    second half of this test pins both behaviors.
    """
    import_reference()
    from wtracker.eval.error_calculator import ErrorCalculator as RefEC

    background, wrm, mic, frames, reader, _ = _make_precise_fixture(rng)

    # all-legal subset -> exact parity
    legal = np.isfinite(wrm).all(axis=1)
    ours_l = ErrorCalculator.calculate_precise(
        background, wrm[legal].copy(), mic[legal].copy(), frames[legal].copy(), reader, diff_thresh=50
    )
    ref_l = RefEC.calculate_precise(
        background, wrm[legal].copy(), mic[legal].copy(), frames[legal].copy(), reader, diff_thresh=50
    )
    np.testing.assert_allclose(ours_l, ref_l, atol=1e-12)

    # with an illegal bbox: ours stays frame-aligned (NaN at the gap, values
    # matching the legal-only run); the reference shifts.
    ours = ErrorCalculator.calculate_precise(
        background, wrm.copy(), mic.copy(), frames.copy(), reader, diff_thresh=50
    )
    assert np.isnan(ours[3])
    np.testing.assert_allclose(ours[legal], ours_l, atol=1e-12)

    ref = RefEC.calculate_precise(
        background, wrm.copy(), mic.copy(), frames.copy(), reader, diff_thresh=50
    )
    assert not np.isnan(ref[3])  # the reference bug: NaN overwritten, tail shifted



def test_analyzer_initialize_matches_reference(sim_log):
    log_path, timing = sim_log
    import_reference()
    from wtracker.eval.data_analyzer import DataAnalyzer as RefDA

    _, ref_timing = make_reference_configs(EXP_KWARGS, TIMING_KWARGS)

    ours = DataAnalyzer.load(timing, log_path)
    ours.initialize(period=10)

    ref = RefDA.load(ref_timing, log_path)
    ref.initialize(period=10)

    assert list(ours.data.columns) == list(ref.data.columns)
    for col in ours.data.columns:
        if pd.api.types.is_numeric_dtype(ours.data[col]):
            np.testing.assert_allclose(
                ours.data[col].to_numpy(),
                ref.data[col].to_numpy(),
                atol=1e-9,
                err_msg=col,
                equal_nan=True,
            )


def test_analyzer_clean_unit_anomalies(sim_log):
    log_path, timing = sim_log
    an = DataAnalyzer.load(timing, log_path)
    an.initialize()
    n0 = len(an.data)

    an.clean(trim_cycles=True, imaging_only=True)
    assert len(an.data) < n0
    assert (an.data["phase"] == "imaging").all()
    assert an.data["cycle"].min() >= 1

    an.change_unit("sec")
    assert an.unit == "sec"
    # a cycle now lasts cycle_frame_num * ms_per_frame / 1000 seconds
    dt = an.data["time"].diff().dropna()
    assert np.isclose(dt[dt > 0].min(), timing.ms_per_frame / 1000, atol=1e-9)
    an.change_unit("frame")

    anomalies = an.calc_anomalies(min_speed=np.inf, min_bbox_error=1.1, remove_anomalies=False)
    assert "no_pred_anomaly" in anomalies.columns

    an.reset_changes()
    assert len(an.data) == n0

    an.remove_cycle(0)
    assert 0 not in an.data["cycle"].unique()

    stats = an.describe(["wrm_speed", "bbox_error"])
    assert "wrm_speed" in stats.columns
    an.print_stats()


def test_batched_precise_matches_loop(sim_log, rng):
    """The fused device kernel equals the per-frame loop implementation."""
    log_path, timing = sim_log
    background, wrm, mic, frames, reader, _ = _make_precise_fixture(rng, n=64)

    loop = ErrorCalculator.calculate_precise(
        background, wrm.copy(), mic.copy(), frames.copy(), reader, diff_thresh=50
    )

    df = pd.DataFrame(
        {
            "frame": frames,
            **{f"wrm_{c}": wrm[:, i] for i, c in enumerate("xywh")},
            **{f"mic_{c}": mic[:, i] for i, c in enumerate("xywh")},
        }
    )
    batched = DataAnalyzer._precise_batched(background, wrm.copy(), mic.copy(), frames, reader, 50)
    np.testing.assert_allclose(batched, loop, atol=1e-6, equal_nan=True)


def test_plotter_smoke(sim_log):
    import matplotlib

    matplotlib.use("Agg")
    from wtracker_tpu.eval.plotter import Plotter

    log_path, timing = sim_log
    an = DataAnalyzer.load(timing, log_path)
    an.initialize()
    plotter = Plotter([an.data, an.data])
    assert plotter.data["log_num"].nunique() == 2

    g = plotter.plot_speed_distribution()
    assert g is not None
    g = plotter.plot_cycle_error()
    g = plotter.plot_trajectory()
    g = plotter.plot_speed_vs_error(cycle_wise=True)
    g = plotter.create_distplot("wrm_speed", condition=lambda d: d["wrm_speed"] > 0)

    import matplotlib.pyplot as plt

    plt.close("all")


def test_vlc_headless_render_and_video(sim_log, tmp_path):
    from wtracker_tpu.eval.vlc import VLC

    log_path, timing = sim_log
    vlc = VLC(files=None, config=timing, log_path=log_path, cam_type="plt", show_cam=True)
    frame = vlc.render_frame(5)
    assert frame.ndim == 3 and frame.shape[2] == 3
    assert (frame != 255).any()  # overlays drawn on the white frame

    vlc.save_frames(str(tmp_path / "frames"), start=0, stop=4)
    import os

    assert len(os.listdir(tmp_path / "frames")) == 4

    video = str(tmp_path / "replay.mp4")
    vlc.make_video(video, start=0, stop=10)
    assert os.path.getsize(video) > 0


def test_plotter_units_from_analyzer(sim_log):
    import matplotlib

    matplotlib.use("Agg")
    from wtracker_tpu.eval.plotter import Plotter

    log_path, timing = sim_log
    an = DataAnalyzer.load(timing, log_path)
    an.initialize()

    # explicit unit plumbed from the analyzer — no inference
    p = Plotter.from_analyzers([an])
    assert p._unit_labels() == ("frame", "px")
    an.change_unit("sec")
    p = Plotter.from_analyzers([an])
    assert p._unit_labels() == ("sec", "μm")

    # the old fractionality heuristic's failure mode: integer-second steps.
    # frame-equality detection (and the explicit override) must not be fooled.
    data = an.data.copy()
    data["time"] = np.arange(len(data), dtype=float)  # integer seconds
    data["frame"] = np.arange(len(data)) + 7  # ≠ time
    assert Plotter([data])._unit_labels() == ("sec", "μm")
    assert Plotter([data], units=("sec", "μm"))._unit_labels() == ("sec", "μm")

    # analyzers with mismatched units are rejected
    an2 = DataAnalyzer.load(timing, log_path)
    an2.initialize()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        Plotter.from_analyzers([an, an2])

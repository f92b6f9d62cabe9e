"""End-to-end smoke tests of the workflow CLIs — the framework's user-facing
surface (the reference's notebooks, docs/workflows.md). Each runs as a real
subprocess on tiny synthetic data, inheriting the CPU-mesh env.

The cheap CLIs (host-loop simulate, analysis, visualize) always run. The
jit-heavy ones (engine sweep, trainers, the full lifecycle) auto-enable on
machines with more than one CPU core; on a 1-core box every subprocess pays a
serial jax init+compile, so there they require an explicit WTRACKER_CLI_FULL=1
(and WTRACKER_CLI_FULL=0 force-disables anywhere)."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

_cli_flag = os.environ.get("WTRACKER_CLI_FULL")
_run_heavy = (_cli_flag not in (None, "")) if _cli_flag is not None else (os.cpu_count() or 1) > 1
if _cli_flag == "0":
    _run_heavy = False
heavy_cli = pytest.mark.skipif(
    not _run_heavy,
    reason="jit-heavy CLI subprocess (1-core box); set WTRACKER_CLI_FULL=1",
)

from tests.synthetic import EXP_KWARGS, TIMING_KWARGS, make_worm_csv
from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig

WF = os.path.join(os.path.dirname(__file__), "..", "workflows")


def _run(script, *args, timeout=900):
    proc = subprocess.run(
        [sys.executable, os.path.join(WF, script), *map(str, args)],
        capture_output=True,
        text=True,
        timeout=timeout,
        # WTRACKER_TPU_PLATFORM is the reliable pin: the axon TPU plugin
        # ignores JAX_PLATFORMS and would route every CLI subprocess through
        # the (wedge-prone) TPU tunnel; the package init honors the config
        # update (wtracker_tpu/__init__.py).
        env={**os.environ, "JAX_PLATFORMS": "cpu", "WTRACKER_TPU_PLATFORM": "cpu"},
    )
    assert proc.returncode == 0, f"{script} failed:\n{proc.stderr[-2000:]}"
    return proc


@pytest.fixture(scope="module")
def base(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wf")
    exp = ExperimentConfig(**EXP_KWARGS)
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    exp.save_json(str(tmp / "exp.json"))
    timing.save_json(str(tmp / "timing.json"))
    make_worm_csv(str(tmp / "worm.csv"))
    return tmp, exp, timing


@pytest.fixture(scope="module")
def sim_out(base):
    tmp, exp, timing = base
    _run(
        "simulate.py",
        "--timing-config", tmp / "timing.json",
        "--exp-config", tmp / "exp.json",
        "--worm-csv", tmp / "worm.csv",
        "--controller", "csv",
        "--backend", "host",  # the engine backend is covered by test_engine*
        "--output", tmp / "sim_out",
    )
    return tmp / "sim_out" / "bboxes.csv"


def test_simulate_cli(sim_out):
    log = pd.read_csv(sim_out)
    assert log.shape[1] == 17 and len(log) > 100


def test_analysis_cli(base, sim_out):
    tmp, exp, timing = base
    _run(
        "analysis.py",
        "--timing-config", tmp / "timing.json",
        "--log", sim_out,
        "--output", tmp / "analysis_out",
    )
    out = pd.read_csv(tmp / "analysis_out" / "analyzed.csv")
    assert "wrm_speed" in out.columns and "bbox_error" in out.columns
    assert any(f.endswith(".png") for f in os.listdir(tmp / "analysis_out"))


@heavy_cli
def test_sweep_cli_mixed_geometry(base):
    tmp, exp, timing = base
    make_worm_csv(str(tmp / "worm2.csv"), num_frames=420, seed=9)
    exp2 = ExperimentConfig("wf2", 420, EXP_KWARGS["frames_per_sec"], (460, 560), 92, (120, 300))
    exp2.save_json(str(tmp / "exp2.json"))
    _run(
        "sweep.py",
        "--timing-config", tmp / "timing.json",
        "--worm-csvs", tmp / "worm.csv", tmp / "worm2.csv",
        "--exp-configs", tmp / "exp.json", tmp / "exp2.json",
        "--output", tmp / "sweep_out",
    )
    a = pd.read_csv(tmp / "sweep_out" / "exp0" / "bboxes.csv")
    b = pd.read_csv(tmp / "sweep_out" / "exp1" / "bboxes.csv")
    assert len(a) > len(b) > 100  # per-stream trimming
    assert int(a["cam_w"].iloc[0]) != int(b["cam_w"].iloc[0])  # per-stream cameras


@heavy_cli
def test_sweep_cli_mixed_timing_buckets(base):
    """Two timing regimes in ONE invocation: the sweep buckets by quantized
    cycle shape and runs each group as its own compiled program."""
    tmp, exp, timing = base
    make_worm_csv(str(tmp / "worm3.csv"), num_frames=420, seed=13)
    exp3 = ExperimentConfig("wf3", 420, EXP_KWARGS["frames_per_sec"], (460, 560), 92, (120, 300))
    exp3.save_json(str(tmp / "exp3.json"))
    slow = TimingConfig(
        experiment_config=exp3, **{**TIMING_KWARGS, "imaging_time_ms": 150.0}
    )
    slow.save_json(str(tmp / "timing_slow.json"))
    proc = _run(
        "sweep.py",
        "--timing-configs", tmp / "timing.json", tmp / "timing_slow.json",
        "--worm-csvs", tmp / "worm.csv", tmp / "worm3.csv",
        "--exp-configs", tmp / "exp.json", tmp / "exp3.json",
        "--output", tmp / "sweep_buckets",
    )
    assert "2 timing buckets" in proc.stdout
    a = pd.read_csv(tmp / "sweep_buckets" / "exp0" / "bboxes.csv")
    b = pd.read_csv(tmp / "sweep_buckets" / "exp1" / "bboxes.csv")
    # different quantizations -> different cycle lengths in the logs
    cyc_a = len(a) // (int(a["cycle"].max()) + 1)
    cyc_b = len(b) // (int(b["cycle"].max()) + 1)
    assert cyc_a != cyc_b, (cyc_a, cyc_b)
    assert len(a) > 100 and len(b) > 100


@heavy_cli
def test_sweep_cli_reference_preset_set(tmp_path):
    """The shipped exp0–exp4 presets (regenerated equivalents of the
    reference's five experiment configs, /root/reference/experiments/exp*/
    exp_config.json) replay as ONE mixed-geometry sweep — the reference's
    full experiment set in a single command (docs/workflows.md)."""
    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    exp_cfgs, timing_cfgs, csvs = [], [], []
    specs = []
    for i in range(5):
        p = os.path.join(cfg_dir, f"exp{i}_config.json")
        exp_cfgs.append(p)
        timing_cfgs.append(os.path.join(cfg_dir, f"exp{i}_timing.json"))
        specs.append(json.load(open(p)))
        csv = tmp_path / f"worm{i}.csv"
        make_worm_csv(str(csv), num_frames=specs[-1]["num_frames"], seed=i)
        csvs.append(csv)

    # the preset set spans the reference's geometry range
    assert [s["num_frames"] for s in specs] == [61200, 65000, 65000, 65000, 65000]
    assert sorted({s["px_per_mm"] for s in specs}) == [88, 90, 92]
    assert all(s["frames_per_sec"] == 60 for s in specs)
    for s, t in zip(specs, (json.load(open(p)) for p in timing_cfgs)):
        assert t["imaging_frame_num"] == 12 and t["pred_frame_num"] == 3
        assert t["camera_size_px"] == [round(4.0 * s["px_per_mm"])] * 2

    _run(
        "sweep.py",
        "--exp-configs", *exp_cfgs,
        "--timing-configs", *timing_cfgs,
        "--worm-csvs", *csvs,
        "--output", tmp_path / "out",
    )
    cams = set()
    for i, s in enumerate(specs):
        df = pd.read_csv(tmp_path / "out" / f"exp{i}" / "bboxes.csv")
        assert len(df) == ((s["num_frames"] - 1) // 15) * 15  # full-length replay
        cams.add(int(df["cam_w"].iloc[0]))
    assert cams == {352, 360, 368}  # px_per_mm 88/90/92 camera quantization


@heavy_cli
def test_predictor_training_cli(base, sim_out):
    tmp, exp, timing = base
    _run(
        "predictor_training.py",
        "--logs", sim_out,
        "--output", tmp / "mlp.npz",
        "--input-frames", 0, -3, -6,
        "--pred-frames", 3,
        "--epochs", 2,
        "--batch", 32,
    )
    assert os.path.exists(tmp / "mlp.npz")


@heavy_cli
def test_polyfit_optimizer_cli(base, sim_out):
    tmp, exp, timing = base
    _run(
        "polyfit_optimizer.py",
        "--timing-config", tmp / "timing.json",
        "--logs", sim_out,
        "--output", tmp / "polyfit_config.json",
        "--sample-times", -10, -5, 0, 3,
        "--pop", 8,
        "--epochs", 3,
    )
    cfg = json.load(open(tmp / "polyfit_config.json"))
    assert len(cfg["weights"]) == 4


def test_visualize_cli(base, sim_out):
    tmp, exp, timing = base
    _run(
        "visualize.py",
        "--timing-config", tmp / "timing.json",
        "--log", sim_out,
        "--video", tmp / "replay.mp4",
        "--start", 0,
        "--stop", 8,
    )
    assert os.path.getsize(tmp / "replay.mp4") > 0


@pytest.fixture(scope="module")
def frames_dir(tmp_path_factory):
    """A tiny synthetic recording: 160x160 BMP frames with a dark arena and a
    bright moving blob (classical-detectable)."""
    import cv2

    tmp = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    n = 150
    pos = np.stack([60 + 30 * np.sin(np.arange(n) / 18), 70 + 25 * np.cos(np.arange(n) / 23)], 1)
    for i in range(n):
        frame = rng.integers(10, 30, size=(160, 160), dtype=np.uint8)
        x, y = pos[i]
        yy, xx = np.mgrid[:160, :160]
        blob = 180 * np.exp(-(((xx - x) / 5.0) ** 2 + ((yy - y) / 4.0) ** 2))
        cv2.imwrite(str(tmp / f"frame_{i:05d}.bmp"), np.clip(frame + blob, 0, 255).astype(np.uint8))
    return tmp


@heavy_cli
def test_experiment_lifecycle_clis(frames_dir, tmp_path_factory):
    """The reference's full experiment lifecycle, CLI by CLI: initialize
    (classical detection + background) -> create yolo images -> train a tiny
    detector -> live-track the recording with it."""
    tmp = tmp_path_factory.mktemp("lifecycle")

    # 1. initialize_experiment: exp config + init_bboxes.csv + background
    _run(
        "initialize_experiment.py",
        "--frames", frames_dir,
        "--output", tmp / "exp0",
        "--fps", 60,
        "--px-per-mm", 90,
        "--bg-probes", 40,
        "--batch", 32,
        timeout=900,
    )
    produced = os.listdir(tmp / "exp0")
    assert any("bboxes" in f for f in produced), produced
    assert any(f.endswith(".npy") for f in produced), produced

    # 2. create_yolo_images: training crops + labels
    _run(
        "create_yolo_images.py",
        "--frames", frames_dir,
        "--output", tmp / "yolo_data",
        "--count", 12,
        "--size", 64, 64,
        "--bg-probes", 30,
        timeout=900,
    )
    crops = [f for f in os.listdir(tmp / "yolo_data") if f.endswith(".png")]
    assert len(crops) == 12  # one fixed-size sample per requested frame

    # 3. yolo_training with the full recipe on labeled crops OF THE RECORDING
    # at the tracking geometry (the reference annotates crops by hand; here
    # labels come from the generator's known blob positions)
    import cv2

    os.makedirs(tmp / "train" / "images")
    os.makedirs(tmp / "train" / "labels")
    rng = np.random.default_rng(1)
    frames = sorted(os.listdir(frames_dir))
    n_pos = 150
    pos = np.stack([60 + 30 * np.sin(np.arange(n_pos) / 18), 70 + 25 * np.cos(np.arange(n_pos) / 23)], 1)
    for k in range(64):
        i = int(rng.integers(0, n_pos))
        frame = cv2.imread(str(frames_dir / frames[i]), cv2.IMREAD_GRAYSCALE)
        x, y = pos[i]
        ox, oy = rng.integers(-14, 15, 2)  # jitter the crop placement
        cx0 = int(np.clip(round(x) - 32 + ox, 0, 160 - 64))
        cy0 = int(np.clip(round(y) - 32 + oy, 0, 160 - 64))
        crop = frame[cy0 : cy0 + 64, cx0 : cx0 + 64]
        cv2.imwrite(str(tmp / "train" / "images" / f"s{k:03d}.png"), crop)
        bx, by = x - cx0, y - cy0
        with open(tmp / "train" / "labels" / f"s{k:03d}.txt", "w") as f:
            f.write(f"0 {bx/64:.4f} {by/64:.4f} {20/64:.4f} {16/64:.4f}\n")
    _run(
        "yolo_training.py",
        "--images", tmp / "train" / "images",
        "--labels", tmp / "train" / "labels",
        "--output", tmp / "det.npz",
        "--scale", "n",
        "--imgsz", 64,
        "--epochs", 60,
        "--batch", 16,
        "--lr0", 3e-3,
        "--close-mosaic", 8,
        "--mosaic", 0.2,
        "--brightness", 0.2,
        timeout=1800,
    )
    assert os.path.exists(tmp / "det.npz")
    assert os.path.exists(tmp / "best.npz") and os.path.exists(tmp / "last.npz")

    # 4. track_video: the live loop over the recording with the trained
    # weights, at a 64 px camera so the tracked views match the training crops
    exp_json = next(f for f in os.listdir(tmp / "exp0") if f.endswith("exp_config.json"))
    timing = TimingConfig(
        experiment_config=ExperimentConfig.load_json(str(tmp / "exp0" / exp_json)),
        **{**TIMING_KWARGS, "camera_size_mm": (64 / 90, 64 / 90)},
    )
    timing.save_json(str(tmp / "timing.json"))
    _run(
        "track_video.py",
        "--frames", frames_dir,
        "--timing-config", tmp / "timing.json",
        "--exp-config", tmp / "exp0" / exp_json,
        "--detector", tmp / "det.npz",
        "--output", tmp / "track_out",
        "--imgsz", 64,
        "--conf", 0.05,
        "--chunk-cycles", 4,
        timeout=900,
    )
    log = pd.read_csv(tmp / "track_out" / "bboxes.csv")
    assert log.shape[1] == 17 and len(log) > 50

    # QUALITY GATE: the tracked worm boxes must actually sit on the blob —
    # compare detection centers against the generator's ground-truth path
    # (missing detections are logged as 0.0 rows by the reference's quirk)
    wrm = log[["wrm_x", "wrm_y", "wrm_w", "wrm_h"]].to_numpy(float)
    detected = (wrm != 0.0).any(axis=1)
    assert detected.mean() >= 0.5, f"detection rate {detected.mean():.2f}"
    centers = wrm[detected, :2] + wrm[detected, 2:] / 2
    gt = pos[log["frame"].to_numpy(int)[detected]]
    err = np.hypot(*(centers - gt).T)
    assert np.median(err) < 6.0, f"median tracking error {np.median(err):.1f} px"

    # 5. quantize_detector: int8 deployment artifact, calibrated on-policy
    # from the bf16 run's camera trajectory
    _run(
        "quantize_detector.py",
        "--detector", tmp / "det.npz",
        "--frames", frames_dir,
        "--timing-config", tmp / "timing.json",
        "--exp-config", tmp / "exp0" / exp_json,
        "--bboxes-csv", tmp / "track_out" / "bboxes.csv",
        "--calib-frames", 24,
        "--imgsz", 64,
        "--output", tmp / "det_int8.npz",
        timeout=900,
    )
    assert os.path.exists(tmp / "det_int8.npz")

    # 6. track_video with the int8 artifact (auto-detected by file content):
    # the quantized serving path must hold the same tracking-quality bar.
    _run(
        "track_video.py",
        "--frames", frames_dir,
        "--timing-config", tmp / "timing.json",
        "--exp-config", tmp / "exp0" / exp_json,
        "--detector", tmp / "det_int8.npz",
        "--output", tmp / "track_int8",
        "--imgsz", 64,
        "--conf", 0.05,
        "--chunk-cycles", 4,
        timeout=900,
    )
    log8 = pd.read_csv(tmp / "track_int8" / "bboxes.csv")
    assert log8.shape[1] == 17 and len(log8) > 50
    wrm8 = log8[["wrm_x", "wrm_y", "wrm_w", "wrm_h"]].to_numpy(float)
    det8 = (wrm8 != 0.0).any(axis=1)
    assert det8.mean() >= 0.5, f"int8 detection rate {det8.mean():.2f}"
    c8 = wrm8[det8, :2] + wrm8[det8, 2:] / 2
    gt8 = pos[log8["frame"].to_numpy(int)[det8]]
    err8 = np.hypot(*(c8 - gt8).T)
    assert np.median(err8) < 8.0, f"int8 median tracking error {np.median(err8):.1f} px"

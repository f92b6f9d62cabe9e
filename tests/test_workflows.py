"""End-to-end smoke tests of the workflow CLIs — the framework's user-facing
surface (the reference's notebooks, docs/workflows.md). Each runs as a real
subprocess on tiny synthetic data, inheriting the CPU-mesh env."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from tests.synthetic import EXP_KWARGS, TIMING_KWARGS, make_worm_csv
from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig

WF = os.path.join(os.path.dirname(__file__), "..", "workflows")


def _run(script, *args, timeout=420):
    proc = subprocess.run(
        [sys.executable, os.path.join(WF, script), *map(str, args)],
        capture_output=True,
        text=True,
        timeout=timeout,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
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

"""Host YoloController: live detection in the hook-based simulator."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.synthetic import TIMING_KWARGS
from wtracker_tpu.models.yolov8 import YoloV8Detector
from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
from wtracker_tpu.sim.controllers import LogConfig, LoggingController, YoloConfig, YoloController
from wtracker_tpu.sim.simulator import Simulator
from wtracker_tpu.utils.frame_reader import ArrayReader


def test_yolo_controller_closed_loop(tmp_path, rng):
    # synthetic recording with a bright blob
    H, W, F = 200, 240, 120
    bg = rng.integers(20, 40, (H, W), dtype=np.uint8)
    frames = np.repeat(bg[None], F, axis=0)
    for i in range(F):
        x, y = 60 + i, 80 + i // 2
        frames[i, y - 4 : y + 4, x - 6 : x + 6] = 220

    # save random detector weights and load them through YoloConfig
    det = YoloV8Detector.init_random(nc=1, scale="n", imgsz=(64, 64), conf=0.0, seed=0)
    weights = str(tmp_path / "det.npz")
    det.save(weights)

    exp = ExperimentConfig("yolo-host", F, 60, (H, W), 90, (66, 84))
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)

    cfg = YoloConfig(model_path=weights, pred_kwargs={"imgsz": 64, "conf": 0.0})
    ctl = YoloController(timing, cfg)
    wrapped = LoggingController(ctl, LogConfig(root_folder=str(tmp_path / "run"), save_err_view=False))

    Simulator(timing, exp, wrapped, reader=ArrayReader(frames)).run(progress=False)

    import pandas as pd

    df = pd.read_csv(tmp_path / "run" / "bboxes.csv")
    n_cycles = (F - 1) // timing.cycle_frame_num
    assert len(df) == n_cycles * timing.cycle_frame_num
    # conf=0 -> a detection logged on every frame (absolute coords)
    wrm = df[["wrm_x", "wrm_y", "wrm_w", "wrm_h"]].to_numpy()
    assert np.isfinite(wrm).all()
    # platform stayed within bounds
    assert df.plt_x.between(0, W - 1).all() and df.plt_y.between(0, H - 1).all()


def test_yolo_config_pickle_excludes_model(tmp_path):
    det = YoloV8Detector.init_random(nc=1, scale="n", imgsz=(64, 64), seed=0)
    weights = str(tmp_path / "det.npz")
    det.save(weights)

    cfg = YoloConfig(model_path=weights)
    cfg.load_model()
    assert cfg.model is not None

    import pickle

    state = pickle.loads(pickle.dumps(cfg))
    assert state.model is None  # the live model never serializes
    assert state.model_path == weights

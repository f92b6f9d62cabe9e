"""Utils-layer tests: configs, CSV logging, readers, async savers, path helpers."""

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pytest

from wtracker_tpu.utils import (
    ArrayReader,
    ConfigBase,
    CSVLogger,
    DummyReader,
    TaskScheduler,
    adjust_num_workers,
)
from wtracker_tpu.utils.path_utils import Files, bulk_rename, join_paths


@dataclass
class _DemoConfig(ConfigBase):
    a: int
    b: float
    derived: float = field(init=False)

    def __post_init__(self):
        self.derived = self.a * self.b


def test_config_json_roundtrip(tmp_path):
    cfg = _DemoConfig(a=3, b=1.5)
    path = str(tmp_path / "cfg.json")
    cfg.save_json(path)

    raw = json.load(open(path))
    assert raw["derived"] == 4.5  # derived fields are persisted

    # load_json bypasses __post_init__: mutate the stored derived field and
    # confirm it is restored verbatim.
    raw["derived"] = 99.0
    json.dump(raw, open(path, "w"))
    loaded = _DemoConfig.load_json(path)
    assert loaded.derived == 99.0
    assert loaded.a == 3


def test_config_pickle_roundtrip(tmp_path):
    cfg = _DemoConfig(a=2, b=2.0)
    path = str(tmp_path / "cfg.pkl")
    cfg.save_pickle(path)
    loaded = _DemoConfig.load_pickle(path)
    assert loaded == cfg


def test_csv_logger(tmp_path):
    path = str(tmp_path / "log.csv")
    with CSVLogger(path, ["a", "b"]) as log:
        log.write({"a": 1, "b": 2})
        log.write([3, 4])
        log.writerows([[5, 6], {"a": 7, "b": 8}])

    import pandas as pd

    df = pd.read_csv(path)
    assert df["a"].tolist() == [1, 3, 5, 7]
    assert df["b"].tolist() == [2, 4, 6, 8]


def test_csv_logger_rejects_malformed_rows(tmp_path):
    """Error contract parity with the reference's DictWriter: unknown dict
    keys raise, and positional rows must exactly fill the schema."""
    path = str(tmp_path / "log.csv")
    with CSVLogger(path, ["a", "b"]) as log:
        with pytest.raises(ValueError, match="not in the schema"):
            log.write({"a": 1, "z": 9})
        with pytest.raises(ValueError, match="cells"):
            log.write([1, 2, 3])
        with pytest.raises(ValueError, match="cells"):
            log.write([1])
        log.write({"a": 1})  # missing keys become empty cells (restval)


def test_dummy_reader():
    reader = DummyReader(10, (32, 48), colored=False)
    assert len(reader) == 10
    assert reader.frame_shape == (32, 48)
    frame = reader[0]
    assert frame.shape == (32, 48)
    assert (frame == 255).all()
    batch = reader.read_batch([0, 3, 5])
    assert batch.shape == (3, 32, 48)
    with pytest.raises(IndexError):
        reader[10]


def test_array_reader_and_stream(rng):
    frames = rng.integers(0, 255, size=(7, 16, 16), dtype=np.uint8)
    reader = ArrayReader(frames)
    assert len(reader) == 7
    np.testing.assert_array_equal(reader[2], frames[2])
    np.testing.assert_array_equal(reader.read_batch([1, 3]), frames[[1, 3]])

    stream = reader.make_stream()
    assert stream.index == -1
    assert stream.progress()
    np.testing.assert_array_equal(stream.read(), frames[0])
    stream.seek(5)
    np.testing.assert_array_equal(stream.read(), frames[5])
    collected = list(iter(reader))
    assert len(collected) == 7


def test_task_scheduler_processes_everything():
    seen = []
    with TaskScheduler(lambda p: seen.append(p[0]), tqdm=False) as sched:
        for i in range(100):
            sched.schedule_save(i)
    assert sorted(seen) == list(range(100))


def test_adjust_num_workers():
    assert adjust_num_workers(0, 10, None) == 0
    assert adjust_num_workers(1000, 10, 4) >= 1
    assert adjust_num_workers(1000, 10, 0) == 0


def test_files_sorting_and_rename(tmp_path):
    for i in [3, 1, 20]:
        (tmp_path / f"frame_{i}.txt").write_text("x")
    files = Files(str(tmp_path), extension=".txt", sorting_key=lambda n: int(n.split("_")[1].split(".")[0]))
    names = [os.path.basename(p) for p in files]
    assert names == ["frame_1.txt", "frame_3.txt", "frame_20.txt"]
    assert "frame_3.txt" in files

    bulk_rename(str(tmp_path), lambda n: "x_" + n)
    assert (tmp_path / "x_frame_1.txt").exists()


def test_join_paths():
    assert join_paths("a", "b", "c") == "a/b/c"


def test_gui_utils_headless_error():
    """GUI prompts must fail with a clear RuntimeError headless (the reference
    crashes deep inside tkinter when a config path is None, gui_utils.py:43)."""
    import pytest

    from wtracker_tpu.utils.gui_utils import UserPrompt

    with pytest.raises(RuntimeError, match="display|tk|headless|GUI"):
        UserPrompt.open_file("pick a file")


def test_stage_timer():
    import time

    from wtracker_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t("alpha"):
        time.sleep(0.01)
    with t("alpha"):
        time.sleep(0.01)
    with t("beta"):
        pass
    report = t.report()
    assert "alpha" in report and "beta" in report
    t.reset()
    assert "alpha" not in t.report()


def test_train_result_helpers():
    from wtracker_tpu.neural.train_results import EpochResult, FitResult

    ep = EpochResult(losses=[2.0, 4.0], accuracy=0.5)
    assert ep.mean_loss == 3.0
    fit = FitResult(num_epochs=3, train_loss=[], train_acc=[], test_loss=[], test_acc=[0.1, 0.9, 0.4])
    assert fit.best_epoch() == 1
    assert FitResult(0, [], [], [], []).best_epoch() == 0

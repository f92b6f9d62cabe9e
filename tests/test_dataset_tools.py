"""Dataset-layer tests: background extraction, device morphology vs OpenCV,
bbox bootstrap vs the reference pipeline, sample extraction."""

import numpy as np
import pytest

from wtracker_tpu.dataset.bg_extractor import BGExtractor
from wtracker_tpu.dataset.box_calculator import BoxCalculator
from wtracker_tpu.dataset.sample_extractor import SampleExtractor
from wtracker_tpu.utils.frame_reader import ArrayReader


def _make_worm_frames(rng, n=12, arena=(96, 128), worm=(9, 13)):
    """Static noisy background + a bright moving blob."""
    bg = rng.integers(20, 36, size=arena, dtype=np.uint8)
    frames = np.repeat(bg[None], n, axis=0)
    boxes = np.zeros((n, 4), dtype=int)
    for i in range(n):
        y = 10 + (i * 5) % (arena[0] - 30)
        x = 12 + (i * 7) % (arena[1] - 30)
        frames[i, y : y + worm[0], x : x + worm[1]] = 200
        boxes[i] = (x, y, worm[1], worm[0])
    return bg, frames, boxes


def test_bg_extractor_median(rng):
    bg, frames, _ = _make_worm_frames(rng, n=24)
    reader = ArrayReader(frames)
    est = BGExtractor(reader).calc_background(num_probes=24, sampling="uniform", method="median")
    # the worm occupies any given pixel in <50% of frames -> median = background
    assert est.shape == bg.shape
    np.testing.assert_array_equal(est, bg)

    est_mean = BGExtractor(reader).calc_background(num_probes=10, sampling="random", method="mean")
    assert est_mean.shape == bg.shape


def test_morphology_matches_opencv(rng):
    cv = pytest.importorskip("cv2")
    import jax.numpy as jnp

    from wtracker_tpu.ops.morphology import dilate, erode, opening

    mask = (rng.uniform(size=(64, 80)) > 0.6).astype(np.uint8) * 255

    got = np.asarray(erode(jnp.asarray(mask > 0), 5))
    want = cv.erode(mask, np.ones((5, 5), np.uint8)) > 0
    np.testing.assert_array_equal(got, want)

    got = np.asarray(dilate(jnp.asarray(mask > 0), 11))
    want = cv.dilate(mask, np.ones((11, 11), np.uint8)) > 0
    np.testing.assert_array_equal(got, want)

    got = np.asarray(opening(jnp.asarray(mask > 0), 5))
    want = cv.morphologyEx(mask, cv.MORPH_OPEN, np.ones((5, 5), np.uint8)) > 0
    np.testing.assert_array_equal(got, want)


def test_box_calculator_vs_opencv_pipeline(rng):
    """Device pipeline equals the reference's OpenCV pipeline on worm frames."""
    cv = pytest.importorskip("cv2")
    bg, frames, true_boxes = _make_worm_frames(rng)

    calc = BoxCalculator(ArrayReader(frames), bg, diff_thresh=20)
    ours = calc.calc_all_boxes()

    for i in range(len(frames)):
        diff = cv.absdiff(frames[i], bg)
        _, mask = cv.threshold(diff, 20, 255, cv.THRESH_BINARY)
        mask = cv.morphologyEx(mask, cv.MORPH_OPEN, np.ones((5, 5), np.uint8))
        mask = cv.dilate(mask, np.ones((11, 11), np.uint8))
        contours, _ = cv.findContours(mask, cv.RETR_EXTERNAL, cv.CHAIN_APPROX_NONE)
        assert contours, "fixture should always have a blob"
        largest = max(contours, key=cv.contourArea)
        want = np.asarray(cv.boundingRect(largest))
        np.testing.assert_array_equal(ours[i], want, err_msg=f"frame {i}")

    # memoization: repeated call returns the cached array
    again = calc.calc_all_boxes()
    np.testing.assert_array_equal(again, ours)
    assert (calc.get_bbox(0) == ours[0]).all()


def test_box_calculator_no_worm(rng):
    bg, frames, _ = _make_worm_frames(rng, n=3)
    frames[1] = bg  # frame without any blob
    calc = BoxCalculator(ArrayReader(frames), bg, diff_thresh=20)
    boxes = calc.calc_all_boxes()
    np.testing.assert_array_equal(boxes[1], [0, 0, 0, 0])
    assert (boxes[0] != 0).any()


def test_sample_extractor(tmp_path, rng):
    import os

    bg, frames, _ = _make_worm_frames(rng)
    calc = BoxCalculator(ArrayReader(frames), bg, diff_thresh=20)
    extractor = SampleExtractor(calc)

    out = str(tmp_path / "samples")
    extractor.create_specified_samples(range(len(frames)), target_size=(48, 40), save_folder=out, seed=0)
    files = sorted(os.listdir(out))
    assert len(files) == len(frames)

    import cv2 as cv

    img = cv.imread(os.path.join(out, files[0]), cv.IMREAD_GRAYSCALE)
    assert img.shape == (40, 48)
    assert (img >= 190).any()  # the worm is inside the crop

    # windows larger than the frame must raise
    with pytest.raises(ValueError):
        extractor.move_bboxes_into_bounds(np.array([[0, 0, 500, 500]]), (128, 96))

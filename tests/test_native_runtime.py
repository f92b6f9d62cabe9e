"""Native frame loader: bit parity with OpenCV and batch integration."""

import os
import time

import numpy as np
import pytest

cv = pytest.importorskip("cv2")

from wtracker_tpu.runtime import native


@pytest.fixture(scope="module")
def bmp_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bmps")
    rng = np.random.default_rng(0)
    gray_paths, color_paths = [], []
    for i in range(24):
        g = rng.integers(0, 255, size=(60, 84), dtype=np.uint8)
        p = str(tmp / f"gray_{i:03d}.bmp")
        assert cv.imwrite(p, g)
        gray_paths.append(p)

        c = rng.integers(0, 255, size=(60, 84, 3), dtype=np.uint8)
        p = str(tmp / f"color_{i:03d}.bmp")
        assert cv.imwrite(p, c)
        color_paths.append(p)
    return gray_paths, color_paths


def test_native_builds():
    assert native.native_available(), "native loader should build with the system g++"


def test_probe(bmp_dir):
    gray_paths, color_paths = bmp_dir
    assert native.probe_bmp(gray_paths[0]) == (60, 84, 1)
    assert native.probe_bmp(color_paths[0]) == (60, 84, 3)


def test_gray_decode_matches_cv2(bmp_dir):
    gray_paths, color_paths = bmp_dir
    got = native.load_batch_bmp(gray_paths, 60, 84, gray=True)
    for i, p in enumerate(gray_paths):
        want = cv.imread(p, cv.IMREAD_GRAYSCALE)
        np.testing.assert_array_equal(got[i], want, err_msg=p)

    # BGR→gray conversion of color BMPs must match cv2 exactly (fixed-point)
    got = native.load_batch_bmp(color_paths, 60, 84, gray=True)
    for i, p in enumerate(color_paths):
        want = cv.imread(p, cv.IMREAD_GRAYSCALE)
        np.testing.assert_array_equal(got[i], want, err_msg=p)


def test_color_decode_matches_cv2(bmp_dir):
    _, color_paths = bmp_dir
    got = native.load_batch_bmp(color_paths, 60, 84, gray=False)
    for i, p in enumerate(color_paths):
        want = cv.imread(p, cv.IMREAD_COLOR)
        np.testing.assert_array_equal(got[i], want, err_msg=p)


def test_frame_reader_batch_uses_native(bmp_dir, tmp_path):
    from wtracker_tpu.utils.frame_reader import FrameReader

    gray_paths, _ = bmp_dir
    root = os.path.dirname(gray_paths[0])
    reader = FrameReader(root, [os.path.basename(p) for p in gray_paths])

    batch = reader.read_batch()
    assert batch.shape == (len(gray_paths), 60, 84)
    for i in range(len(gray_paths)):
        np.testing.assert_array_equal(batch[i], reader[i])

    sub = reader.read_batch([3, 7, 11])
    np.testing.assert_array_equal(sub[1], reader[7])


def test_bad_input_errors(tmp_path):
    bad = str(tmp_path / "not_a.bmp")
    open(bad, "wb").write(b"garbage")
    with pytest.raises(ValueError):
        native.load_batch_bmp([bad], 10, 10)
    with pytest.raises(ValueError):
        native.probe_bmp(bad)


def test_window_decode_matches_full_slices(bmp_dir):
    """Windowed decode (ROI streaming) == slicing the full decode, all formats."""
    gray_paths, color_paths = bmp_dir
    rng = np.random.default_rng(1)
    n = len(gray_paths)
    win_h, win_w = 22, 31
    tls = np.stack(
        [rng.integers(0, 84 - win_w, n), rng.integers(0, 60 - win_h, n)], axis=1
    ).astype(np.int32)

    for paths, gray in [(gray_paths, True), (color_paths, True), (color_paths, False)]:
        full = native.load_batch_bmp(paths, 60, 84, gray=gray)
        got = native.load_batch_bmp_window(paths, 60, 84, tls, win_h, win_w, gray=gray)
        want = np.stack([full[i, y : y + win_h, x : x + win_w] for i, (x, y) in enumerate(tls)])
        np.testing.assert_array_equal(got, want)

    # out= target round-trips
    out = np.empty((n, win_h, win_w), np.uint8)
    got = native.load_batch_bmp_window(gray_paths, 60, 84, tls, win_h, win_w, gray=True, out=out)
    assert got is out


def test_window_decode_out_of_bounds_errors(bmp_dir):
    gray_paths, _ = bmp_dir
    tls = np.array([[80, 0]], np.int32)  # x + win_w > 84
    with pytest.raises(ValueError):
        native.load_batch_bmp_window(gray_paths[:1], 60, 84, tls, 20, 20)


def test_frame_reader_window_batch(bmp_dir, tmp_path):
    gray_paths, _ = bmp_dir
    import shutil

    from wtracker_tpu.utils.frame_reader import FrameReader

    d = tmp_path / "win_frames"
    d.mkdir()
    for p in gray_paths[:6]:
        shutil.copy(p, d / os.path.basename(p))
    reader = FrameReader.create_from_directory(str(d))
    full = reader.read_batch(range(6))
    tls = np.array([[3, 5]] * 6, np.int32)
    got = reader.read_window_batch(range(6), tls, (30, 40))
    np.testing.assert_array_equal(got, full[:, 5:35, 3:43])
    with pytest.raises(ValueError, match="bounds"):
        reader.read_window_batch(range(6), np.array([[60, 0]] * 6), (30, 40))

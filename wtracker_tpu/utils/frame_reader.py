"""Frame IO: random-access directory readers, streaming cursor, synthetic frames.

Capability parity with the reference ``wtracker/utils/frame_reader.py`` —
``FrameReader`` (10-157), ``FrameStream`` (159-244) and ``DummyReader``
(247-272, the no-video fake backend that lets the full simulator stack run
without any data; auto-selected by the simulator in headless mode).

TPU-minded additions: ``FrameReader.read_batch`` decodes many frames into one
contiguous ``(N, H, W[, C])`` array so callers can ship whole cycles (or whole
experiments) to the device in a single transfer instead of per-frame hops, and
``ArrayReader`` wraps pre-decoded in-memory frames.
"""

from __future__ import annotations

import glob
import os

import cv2 as cv
import numpy as np

from wtracker_tpu.utils.path_utils import join_paths


def _sorted_dir_files(root_folder: str, pattern: str) -> list[str]:
    """Names under ``root_folder`` matching ``pattern``, files only, sorted."""
    names = glob.glob(pattern, root_dir=root_folder)
    return sorted(n for n in names if os.path.isfile(join_paths(root_folder, n)))


class FrameReader:
    """Random-access reader over an ordered list of image files in a directory.

    Args:
        root_folder: directory holding the frame files.
        frame_files: ordered file names (relative to ``root_folder``).
        read_format: an OpenCV imread flag; grayscale by default.
    """

    def __init__(
        self,
        root_folder: str,
        frame_files: list[str],
        read_format: int = cv.IMREAD_GRAYSCALE,
    ):
        assert os.path.exists(root_folder)
        assert len(frame_files) > 0

        self._root_folder = root_folder
        self._files = frame_files
        self._read_format = read_format
        self._frame_shape = self._extract_frame_shape()

    # -- construction helpers ---------------------------------------------------

    @classmethod
    def create_from_template(
        cls, root_folder: str, name_format: str, read_format: int = cv.IMREAD_GRAYSCALE
    ) -> "FrameReader":
        """Build a reader from a ``name.format()``-style file template."""
        names = _sorted_dir_files(root_folder, name_format.format("[0-9]*"))
        return cls(root_folder, names, read_format)

    @classmethod
    def create_from_directory(cls, root_folder: str, read_format: int = cv.IMREAD_GRAYSCALE) -> "FrameReader":
        """Build a reader from every file in a directory (sorted by name)."""
        return cls(root_folder, _sorted_dir_files(root_folder, "*.*"), read_format)

    # -- decode ------------------------------------------------------------------

    def _path_of(self, idx: int) -> str:
        return join_paths(self._root_folder, self._files[idx])

    def _extract_frame_shape(self) -> tuple[int, ...]:
        # Overridable probe: synthetic readers report a shape without decoding.
        return cv.imread(self._path_of(0), self._read_format).shape

    def __getitem__(self, idx: int) -> np.ndarray:
        if not 0 <= idx < len(self._files):
            raise IndexError("index out of bounds")
        return cv.imread(self._path_of(idx), self._read_format).astype(np.uint8, copy=False)

    def read_batch(
        self, indices: np.ndarray | list[int] | None = None, out: np.ndarray | None = None
    ) -> np.ndarray:
        """Decode many frames into one contiguous uint8 array ``(N, *frame_shape)``.

        BMP sources decode through the native multithreaded loader
        (:mod:`wtracker_tpu.runtime`) when available — one parallel decode
        into the batch buffer instead of per-frame ``cv.imread`` calls.

        ``out`` optionally receives the frames in place (shape
        ``(len(indices), *frame_shape)``); streaming callers should reuse a
        buffer — fresh-allocation page faults cost more than the decode
        itself on some hosts (docs/performance.md round 4).
        """
        picks = list(range(len(self))) if indices is None else [int(i) for i in indices]
        if out is not None and out.shape != (len(picks), *self._frame_shape):
            raise ValueError(f"out shape {out.shape} != {(len(picks), *self._frame_shape)}")

        fast = self._try_native_batch(picks, out)
        if fast is not None:
            return fast

        if out is None:
            out = np.empty((len(picks), *self._frame_shape), dtype=np.uint8)
        for slot, idx in enumerate(picks):
            out[slot] = self[idx]
        return out

    def read_window_batch(
        self,
        indices: np.ndarray | list[int],
        top_lefts: np.ndarray,
        window_hw: tuple[int, int],
        out: np.ndarray | None = None,
    ) -> np.ndarray:
        """Decode one fixed-size window per frame (ROI streaming).

        A closed-loop tracker only ever looks at a camera-sized view, so this
        reads just the rows the window covers (BMP sources: one seek + one
        contiguous read per frame through the native loader — cold-disk bytes
        drop by ``full_h/win_h`` and decoded bytes by the window area ratio).

        Args:
            top_lefts: (N, 2) int window origins in (x, y) order; every window
                must lie fully inside the frame.
            window_hw: (win_h, win_w) shared window size.
            out: optional preallocated ``(N, win_h, win_w[, C])`` uint8 target.
        """
        picks = [int(i) for i in indices]
        win_h, win_w = window_hw
        tls = np.asarray(top_lefts, dtype=np.int32).reshape(len(picks), 2)
        full_h, full_w = self._frame_shape[:2]
        if (
            tls.min(initial=0) < 0
            or (tls[:, 0] + win_w > full_w).any()
            or (tls[:, 1] + win_h > full_h).any()
        ):
            raise ValueError("window out of frame bounds")
        shape = (len(picks), win_h, win_w, *self._frame_shape[2:])
        if out is not None and out.shape != shape:
            raise ValueError(f"out shape {out.shape} != {shape}")

        fast = self._try_native_window_batch(picks, tls, window_hw, out)
        if fast is not None:
            return fast

        if out is None:
            out = np.empty(shape, dtype=np.uint8)
        for slot, (idx, (x0, y0)) in enumerate(zip(picks, tls)):
            out[slot] = self[idx][y0 : y0 + win_h, x0 : x0 + win_w]
        return out

    def _try_native_window_batch(
        self,
        indices: list[int],
        tls: np.ndarray,
        window_hw: tuple[int, int],
        out: np.ndarray | None = None,
    ) -> np.ndarray | None:
        if self._read_format not in (cv.IMREAD_GRAYSCALE, cv.IMREAD_COLOR):
            return None
        paths = [self._path_of(i) for i in indices]
        if not paths or not all(p.lower().endswith(".bmp") for p in paths):
            return None
        try:
            from wtracker_tpu.runtime import native

            if not native.native_available():
                return None
            h, w = self._frame_shape[:2]
            return native.load_batch_bmp_window(
                paths, h, w, tls, *window_hw,
                gray=self._read_format == cv.IMREAD_GRAYSCALE, out=out,
            )
        except Exception:
            return None  # any native hiccup falls back to the cv2 loop

    def _try_native_batch(self, indices: list[int], out: np.ndarray | None = None) -> np.ndarray | None:
        if self._read_format not in (cv.IMREAD_GRAYSCALE, cv.IMREAD_COLOR):
            return None
        paths = [self._path_of(i) for i in indices]
        if not paths or not all(p.lower().endswith(".bmp") for p in paths):
            return None
        try:
            from wtracker_tpu.runtime import native

            if not native.native_available():
                return None
            h, w = self._frame_shape[:2]
            return native.load_batch_bmp(
                paths, h, w, gray=self._read_format == cv.IMREAD_GRAYSCALE, out=out
            )
        except Exception:
            return None  # any native hiccup falls back to the cv2 loop

    # -- introspection --------------------------------------------------------------

    @property
    def root_folder(self) -> str:
        return self._root_folder

    @property
    def files(self) -> list[str]:
        return self._files

    @property
    def read_format(self) -> int:
        return self._read_format

    @property
    def frame_shape(self) -> tuple[int, ...]:
        """Full frame shape, ``(h, w)`` or ``(h, w, c)``."""
        return self._frame_shape

    @property
    def frame_size(self) -> tuple[int, int]:
        """Spatial frame size ``(h, w)``."""
        return self._frame_shape[:2]

    def __len__(self) -> int:
        return len(self._files)

    # -- streaming ---------------------------------------------------------------------

    def __iter__(self) -> "FrameStream":
        return FrameStream(self)

    def make_stream(self) -> "FrameStream":
        """A fresh streaming cursor over this reader."""
        return FrameStream(self)


class FrameStream:
    """A seekable iterator/cursor over a :class:`FrameReader`.

    The cursor starts *before* the first frame (index -1); ``progress()`` or
    iteration advances it.  ``read()`` memoizes the current frame until the
    cursor moves.
    """

    def __init__(self, frame_reader: FrameReader):
        self._frame_reader = frame_reader
        self._idx = -1
        self.frame: np.ndarray | None = None

    @property
    def index(self) -> int:
        """Index of the current frame."""
        return self._idx

    def __len__(self) -> int:
        return len(self._frame_reader)

    def __iter__(self) -> "FrameStream":
        return self

    def __next__(self) -> np.ndarray:
        if not self.progress():
            raise StopIteration()
        return self.read()

    def can_read(self) -> bool:
        return 0 <= self._idx < len(self._frame_reader)

    def seek(self, idx: int) -> bool:
        """Move the cursor to ``idx``; returns whether a frame can be read there."""
        self._idx = idx
        self.frame = None
        return self.can_read()

    def progress(self, n: int = 1) -> bool:
        """Advance the cursor by ``n`` frames."""
        return self.seek(self._idx + n)

    def read(self) -> np.ndarray:
        """The frame at the cursor (memoized until the cursor moves)."""
        if not self.can_read():
            raise IndexError("index out of bounds")
        if self.frame is None:
            self.frame = self._frame_reader[self._idx]
        return self.frame

    def reset(self) -> None:
        """Rewind to before the first frame."""
        self.seek(-1)


class DummyReader(FrameReader):
    """Synthetic reader producing constant white frames — the no-data backend.

    Lets the whole simulator/controller/logging stack run with no video at all
    (the reference's de-facto integration-test fixture).
    """

    def __init__(self, num_frames: int, resolution: tuple[int, int], colored: bool = True):
        self.colored = colored
        self._resolution = resolution
        shape = (*resolution, 3) if colored else resolution
        self._frame = np.full(shape, fill_value=255, dtype=np.uint8)
        super().__init__(".", frame_files=[str(i) for i in range(num_frames)])

    def _extract_frame_shape(self) -> tuple[int, ...]:
        return self._frame.shape

    def __getitem__(self, idx: int) -> np.ndarray:
        if not 0 <= idx < len(self):
            raise IndexError("index out of bounds")
        return self._frame.copy()

    def read_batch(self, indices=None) -> np.ndarray:
        n = len(self) if indices is None else len(indices)
        return np.broadcast_to(self._frame, (n, *self._frame.shape)).copy()


class ArrayReader(FrameReader):
    """Reader over an in-memory ``(N, H, W[, C])`` uint8 array.

    TPU-native addition: experiments pre-decoded into contiguous memory (or
    memory-mapped ``.npy``) feed the scan engine without per-frame decode cost.
    """

    def __init__(self, frames: np.ndarray):
        assert frames.ndim in (3, 4)
        self._frames = frames
        super().__init__(".", frame_files=[str(i) for i in range(frames.shape[0])])

    def _extract_frame_shape(self) -> tuple[int, ...]:
        return tuple(self._frames.shape[1:])

    def __getitem__(self, idx: int) -> np.ndarray:
        if not 0 <= idx < len(self):
            raise IndexError("index out of bounds")
        return np.asarray(self._frames[idx])

    @property
    def array(self) -> np.ndarray:
        return self._frames

    def read_batch(self, indices=None) -> np.ndarray:
        if indices is None:
            return np.asarray(self._frames)
        return np.asarray(self._frames[np.asarray(indices, dtype=int)])

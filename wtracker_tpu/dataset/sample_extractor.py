"""Training-sample extraction: crop fixed-size images around detected worms.

Capability parity with the reference ``wtracker/dataset/sample_extractor.py:
9-153``: jitter a fixed-size crop window randomly around each detected bbox,
shift windows fully inside the frame, and save crops asynchronously.  Used to
build YOLO training datasets.
"""

from __future__ import annotations

from typing import Collection

import numpy as np

from wtracker_tpu.dataset.box_calculator import BoxCalculator
from wtracker_tpu.utils import bbox as bb
from wtracker_tpu.utils.io_utils import FrameSaver


class SampleExtractor:
    """Extracts fixed-size training samples centered near detected worms."""

    def __init__(self, bbox_calculator: BoxCalculator):
        self._bbox_calculator = bbox_calculator
        self._frame_reader = bbox_calculator._frame_reader

    def move_bboxes_into_bounds(self, bboxes: np.ndarray, frame_size: tuple[int, int]) -> np.ndarray:
        """Shift crop windows so they lie inside ``frame_size`` (w, h).

        Raises:
            ValueError: if a window is larger than the frame.
        """
        max_w, max_h = frame_size
        x, y, w, h = bboxes[:, 0].copy(), bboxes[:, 1].copy(), bboxes[:, 2], bboxes[:, 3]

        x = np.where(x < 0, 0, x)
        over = x + w > max_w
        x = np.where(over, max_w - w, x)

        y = np.where(y < 0, 0, y)
        over = y + h > max_h
        y = np.where(over, max_h - h, y)

        if np.any(x < 0) or np.any(y < 0) or np.any(x + w > max_w) or np.any(y + h > max_h):
            raise ValueError("sample window does not fit inside the frame")

        return bb.pack(x, y, w, h)

    def create_specified_samples(
        self,
        frame_indices: Collection[int],
        target_size: tuple[int, int],
        save_folder: str,
        name_format: str = "img_{:09d}.png",
        num_workers: int | None = None,
        chunk_size: int = 256,
        seed: int | None = None,
    ) -> None:
        """Extract one sample per given frame and save them asynchronously.

        Args:
            frame_indices: frames to sample from.
            target_size: crop size (w, h).
            save_folder: output directory.
            name_format: file name template (formatted with the sample index).
            seed: RNG seed for the crop jitter (None = nondeterministic).
        """
        bboxes = self._bbox_calculator.calc_specified_boxes(
            frame_indices=frame_indices, num_workers=num_workers, chunk_size=chunk_size
        )

        rng = np.random.default_rng(seed)
        x, y, w, h = bboxes[:, 0], bboxes[:, 1], bboxes[:, 2], bboxes[:, 3]

        # jitter the window so the worm lands at a random position inside it
        x = x - rng.integers(0, target_size[0] - w + 1)
        y = y - rng.integers(0, target_size[1] - h + 1)
        w = np.full_like(x, target_size[0])
        h = np.full_like(y, target_size[1])
        windows = bb.pack(x, y, w, h)

        frame_size = tuple(reversed(self._frame_reader.frame_size))  # (h, w) -> (w, h)
        windows = self.move_bboxes_into_bounds(windows, frame_size)

        with FrameSaver(self._frame_reader, root_path=save_folder, tqdm=False) as saver:
            for i, (frame_idx, window) in enumerate(zip(frame_indices, windows)):
                saver.schedule_save(int(frame_idx), tuple(int(v) for v in window), name_format.format(i))

    def create_samples(
        self,
        count: int,
        target_size: tuple[int, int],
        save_folder: str,
        name_format: str = "img_{:09d}.png",
        num_workers: int | None = None,
        chunk_size: int = 256,
        seed: int | None = None,
    ) -> None:
        """Extract samples from ``count`` randomly chosen frames."""
        length = len(self._frame_reader)
        count = min(length, count)
        frame_indices = np.random.default_rng(seed).choice(length, size=count, replace=False)
        self.create_specified_samples(
            frame_indices, target_size, save_folder, name_format, num_workers, chunk_size, seed
        )

    def create_all_samples(
        self,
        target_size: tuple[int, int],
        save_folder: str,
        name_format: str = "img_{:09d}.png",
        num_workers: int | None = None,
        chunk_size: int = 256,
        seed: int | None = None,
    ) -> None:
        """Extract one sample from every frame."""
        self.create_specified_samples(
            range(len(self._frame_reader)), target_size, save_folder, name_format, num_workers, chunk_size, seed
        )

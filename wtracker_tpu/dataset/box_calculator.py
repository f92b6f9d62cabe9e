"""Classical bbox bootstrap: detect the worm without a trained model.

Capability parity with the reference ``wtracker/dataset/box_calculator.py:
11-161``: per frame, absdiff vs background → threshold → 5×5 opening → 11×11
dilation → bbox of the largest blob; results memoized in an all-frames array
with (-1, -1, -1, -1) sentinels.

The reference parallelizes with a CPU process pool (box_calculator.py:124-131).
Here the whole pipeline is the batched device kernel
:func:`wtracker_tpu.ops.morphology.worm_bboxes_batch` — frames are decoded on
host in chunks and swept on the TPU, no multiprocessing needed.
"""

from __future__ import annotations

from typing import Collection

import numpy as np
from tqdm.auto import tqdm

from wtracker_tpu.ops.morphology import worm_bboxes_batch
from wtracker_tpu.utils.frame_reader import FrameReader


class BoxCalculator:
    """Computes worm bounding boxes for frames of an experiment.

    Args:
        frame_reader: the experiment's frames.
        background: background image matching the frame shape.
        diff_thresh: foreground threshold on |frame − background|.
    """

    def __init__(
        self,
        frame_reader: FrameReader,
        background: np.ndarray,
        diff_thresh: int = 20,
    ) -> None:
        assert diff_thresh > 0, "Difference threshold must be greater than 0."

        if background.ndim == 3 and background.shape[2] == 3:
            background = (
                (0.114 * background[..., 0] + 0.587 * background[..., 1] + 0.299 * background[..., 2])
                .round()
                .astype(np.uint8)
            )
        if background.ndim != 2:
            raise ValueError("background must be either a gray or a color image.")

        assert frame_reader.frame_size == background.shape[:2], "Background shape must match frame shape."

        self._frame_reader = frame_reader
        self._background = background
        self._diff_thresh = diff_thresh
        self._all_bboxes = np.full((len(frame_reader), 4), -1, dtype=int)

    def all_bboxes(self) -> np.ndarray:
        """All computed boxes, (N, 4) xywh; uncomputed rows are -1."""
        return self._all_bboxes

    def get_bbox(self, frame_idx: int) -> np.ndarray:
        """Bbox for one frame (computed on demand, then memoized)."""
        if self._all_bboxes[frame_idx, 0] == -1:
            self.calc_specified_boxes([frame_idx])
        return self._all_bboxes[frame_idx]

    def _grayscale(self, frames: np.ndarray) -> np.ndarray:
        if frames.ndim == 4 and frames.shape[-1] == 3:
            frames = (
                (0.114 * frames[..., 0] + 0.587 * frames[..., 1] + 0.299 * frames[..., 2]).round().astype(np.uint8)
            )
        return frames

    def calc_specified_boxes(
        self,
        frame_indices: Collection[int],
        num_workers: int | None = None,
        chunk_size: int = 256,
    ) -> np.ndarray:
        """Compute boxes for the given frames (device-batched in chunks).

        ``num_workers`` is accepted for API compatibility; batching replaces
        the reference's process pool.
        """
        indices = np.asarray(list(frame_indices), dtype=int)
        todo = indices[self._all_bboxes[indices, 0] == -1]

        for s in tqdm(
            range(0, len(todo), chunk_size), desc="Extracting bboxes", unit="chunk", disable=len(todo) <= chunk_size
        ):
            chunk = todo[s : s + chunk_size]
            frames = self._grayscale(self._frame_reader.read_batch(chunk))
            boxes, found = worm_bboxes_batch(frames, self._background, self._diff_thresh)
            boxes = np.array(boxes)
            boxes[~np.asarray(found)] = 0  # no blob -> zero box, like the reference
            self._all_bboxes[chunk] = boxes

        return self._all_bboxes[indices, :]

    def calc_all_boxes(
        self,
        num_workers: int | None = None,
        chunk_size: int = 256,
    ) -> np.ndarray:
        """Compute boxes for every frame."""
        return self.calc_specified_boxes(range(len(self._frame_reader)), num_workers, chunk_size)

"""Async image/frame saving and pickle helpers.

Capability parity with the reference ``wtracker/utils/io_utils.py`` —
``FrameSaver`` (11-61), ``ImageSaver`` (64-105) and the wrapped pickle helpers
(108-147).  Savers run on a :class:`~wtracker_tpu.utils.threading_utils.TaskScheduler`
worker thread so disk writes never block the caller; a failed write retries
once after creating the parent directory.
"""

from __future__ import annotations

import pickle

import cv2 as cv
import numpy as np

from wtracker_tpu.utils.frame_reader import FrameReader
from wtracker_tpu.utils.path_utils import create_directory, create_parent_directory, join_paths
from wtracker_tpu.utils.threading_utils import TaskScheduler


def _imwrite_with_retry(save_path: str, img: np.ndarray) -> None:
    if not cv.imwrite(save_path, img):
        create_parent_directory(save_path)
        if not cv.imwrite(save_path, img):
            raise ValueError(f"Failed to save image {save_path}")


class FrameSaver(TaskScheduler):
    """Asynchronously save crops cut from a :class:`FrameReader` by index + bbox."""

    def __init__(
        self,
        frame_reader: FrameReader,
        root_path: str = "",
        maxsize: int = 100,
        tqdm: bool = True,
        **tqdm_kwargs,
    ):
        super().__init__(self._save_frame, maxsize, tqdm, **tqdm_kwargs)
        self._frame_reader = frame_reader
        self._root_path = root_path
        create_directory(root_path)

    def schedule_save(self, img_index: int, crop_dims: tuple[int, int, int, int], img_name: str) -> None:
        """Queue saving of frame ``img_index`` cropped to ``(x, y, w, h)``."""
        super().schedule_save(img_index, crop_dims, img_name)

    def _save_frame(self, params: tuple[int, tuple[int, int, int, int], str]) -> None:
        img_index, (x, y, w, h), img_name = params
        save_path = join_paths(self._root_path, img_name)
        img = self._frame_reader[img_index]
        _imwrite_with_retry(save_path, img[y : y + h, x : x + w])


class ImageSaver(TaskScheduler):
    """Asynchronously save in-memory image arrays to disk."""

    def __init__(
        self,
        root_path: str = "",
        maxsize: int = 100,
        tqdm: bool = True,
        **tqdm_kwargs,
    ):
        super().__init__(self._save_image, maxsize, tqdm, **tqdm_kwargs)
        self._root_path = root_path
        create_directory(root_path)

    def schedule_save(self, img: np.ndarray, img_name: str) -> None:
        """Queue saving of ``img`` under ``img_name`` (relative to the root path)."""
        super().schedule_save(img, img_name)

    def _save_image(self, params: tuple[np.ndarray, str]) -> None:
        img, img_name = params
        _imwrite_with_retry(join_paths(self._root_path, img_name), img)


def pickle_load_object(file_path: str):
    """Load a pickled object, wrapping errors with the offending path."""
    try:
        with open(file_path, "rb") as f:
            return pickle.load(f)
    except FileNotFoundError:
        raise FileNotFoundError(f"file does not exist: {file_path}")
    except Exception as e:
        raise ValueError(f"error loading object from pickle file: {e}")


def pickle_save_object(obj, file_path: str) -> None:
    """Pickle an object to ``file_path``, creating parent directories as needed."""
    try:
        create_parent_directory(file_path)
        with open(file_path, "wb") as f:
            pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)
    except Exception as e:
        raise ValueError(f"error saving object to pickle file: {e}")

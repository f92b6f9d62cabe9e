"""Filesystem path helpers and a sorted-directory iterator.

Capability parity with the reference ``wtracker/utils/path_utils.py`` —
``join_paths``/directory creation (8-62), ``bulk_rename`` (65-82) and the
``Files`` scandir iterator with a caller-supplied sorting key (85-236), used to
order frame files for the readers.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path, PurePath
from typing import Callable, Iterator, Union


def absolute_path(file_path: str) -> str:
    """Absolute, posix-style path for a file."""
    return Path(file_path).resolve().as_posix()


def join_paths(*path_segments: str) -> str:
    """Join path segments into a single posix-style path string."""
    return PurePath(*path_segments).as_posix()


def create_parent_directory(file_path: str) -> None:
    """Ensure the parent directory of ``file_path`` exists."""
    Path(file_path).parent.mkdir(parents=True, exist_ok=True)


def create_directory(dir_path: str) -> None:
    """Ensure the directory exists."""
    Path(dir_path).mkdir(parents=True, exist_ok=True)


def bulk_rename(dir_path: str, rename_fn: Callable[[str], str]) -> None:
    """Rename every file (not subdirectory) in ``dir_path`` via ``rename_fn``."""
    root = Path(dir_path)
    for entry in root.iterdir():
        if entry.is_dir():
            continue
        entry.rename(root / rename_fn(entry.name))


class Files:
    """Iterate the files of a directory in a caller-defined order.

    Args:
        directory: directory to scan.
        extension: keep only entries whose (lowercased) name ends with this.
        scan_dirs: include subdirectories in the results.
        return_full_path: yield full paths instead of bare names.
        sorting_key: maps a file *name* to its sort key (e.g. parse the frame
            number out of ``frame_000123.bmp``).
    """

    def __init__(
        self,
        directory: str,
        extension: str = "",
        scan_dirs: bool = False,
        return_full_path: bool = True,
        sorting_key: Callable[[str], Union[int, str]] = lambda name: name,
    ) -> None:
        self.root = directory
        self.extension = extension.lower()
        self.scan_dirs = scan_dirs
        self.return_full_path = return_full_path
        self.sorting_func = sorting_key
        self.results: list[os.DirEntry] = []
        self._pos = -1
        self._scan()

    def _scan(self) -> None:
        entries = []
        for entry in os.scandir(self.root):
            if entry.is_dir():
                if self.scan_dirs:
                    entries.append(entry)
            elif entry.name.lower().endswith(self.extension):
                entries.append(entry)
        self.results = sorted(entries, key=lambda e: self.sorting_func(e.name))
        self._pos = -1

    def __getitem__(self, index: int) -> os.DirEntry:
        return self.results[index]

    def __len__(self) -> int:
        return len(self.results)

    def __iter__(self) -> Iterator[str]:
        self._pos = -1
        return self

    def __next__(self) -> str:
        self._pos += 1
        if self._pos >= len(self.results):
            raise StopIteration
        entry = self.results[self._pos]
        return entry.path if self.return_full_path else entry.name

    def __contains__(self, key: str) -> bool:
        return any(res.name == key for res in self.results)

    def get_filename(self) -> str:
        return self.results[self._pos].name

    def get_path(self) -> str:
        return self.results[self._pos].path

    def seek(self, pos: int) -> str:
        assert 0 <= pos < len(self), "Invalid position"
        self._pos = pos - 1
        return next(self)

    def copy(self, dst_root: str) -> None:
        shutil.copy2(self.get_path(), dst=dst_root)

"""Streaming CSV logging.

Capability parity with the reference ``wtracker/utils/log_utils.py:5-91``.
The 17-column per-frame simulation log written through this class is the
system's core dataflow artifact (consumed by eval/, controllers, and VLC), so
write/flush semantics mirror the reference exactly.
"""

from __future__ import annotations

import csv
from typing import Iterable


class CSVLogger:
    """Dict-row CSV writer with explicit flush/close and context management."""

    def __init__(self, path: str, col_names: list[str], mode: str = "w+"):
        self.path = path
        self.col_names = col_names
        self._file = open(self.path, mode, newline="")
        self._writer = csv.DictWriter(self._file, self.col_names, escapechar=",")
        self._writer.writeheader()
        self.flush()

    def __enter__(self) -> "CSVLogger":
        return self

    def __exit__(self, exc_type, exc_value, traceback) -> None:
        self.close()

    def close(self) -> None:
        if not self._file.closed:
            self._file.flush()
            self._file.close()

    def _to_dict(self, items: Iterable) -> dict:
        return dict(zip(self.col_names, items))

    def write(self, row: dict | Iterable) -> None:
        """Write one row — a dict keyed by column names, or an ordered iterable."""
        assert self._file.writable()
        if not isinstance(row, dict):
            row = self._to_dict(row)
        self._writer.writerow(row)

    def writerows(self, rows: list[dict] | list[Iterable]) -> None:
        """Write many rows at once."""
        assert self._file.writable()
        assert len(rows) > 0
        rows = [row if isinstance(row, dict) else self._to_dict(row) for row in rows]
        self._writer.writerows(rows)

    def flush(self) -> None:
        self._file.flush()

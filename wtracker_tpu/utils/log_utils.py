"""Streaming CSV logging.

Capability parity with the reference ``wtracker/utils/log_utils.py:5-91``: a
header-on-open, explicitly flushable CSV sink accepting dict or positional
rows. The 17-column per-frame simulation log written through this class is the
system's core dataflow artifact (consumed by eval/, controllers, and VLC), so
the on-disk format (csv dialect, ``escapechar=','``, header-then-flush on
construction) is preserved byte-for-byte.

Implementation note: rows are normalized to *ordered value tuples* and emitted
through a plain ``csv.writer`` — dict rows are projected through the column
list at write time. (The reference does the inverse: positional rows are
lifted into dicts for a ``DictWriter``.) Both produce identical bytes for the
same dialect; the tuple path avoids building a throwaway dict per frame row.
"""

from __future__ import annotations

import csv
from typing import Iterable, Mapping, Sequence


class CSVLogger:
    """Append-oriented CSV sink bound to a fixed column schema.

    Opens the file and writes the header immediately so that readers tailing
    the log (or a crashed run) always see a well-formed CSV. Usable as a
    context manager; ``close()`` is idempotent.
    """

    def __init__(self, path: str, col_names: Sequence[str], mode: str = "w+"):
        self.path = path
        self.col_names = list(col_names)
        self._sink = open(path, mode, newline="")
        self._emit = csv.writer(self._sink, escapechar=",").writerow
        self._emit(self.col_names)
        self.flush()

    # -- lifecycle ---------------------------------------------------------

    def __enter__(self) -> "CSVLogger":
        return self

    def __exit__(self, *exc_info) -> None:
        self.close()

    def flush(self) -> None:
        self._sink.flush()

    def close(self) -> None:
        if self._sink.closed:
            return
        self._sink.flush()
        self._sink.close()

    # -- row emission ------------------------------------------------------

    def _ordered(self, row: Mapping | Iterable) -> tuple:
        """Normalize a row to a value tuple in schema order.

        Dict rows are looked up column-by-column (missing keys become empty
        cells, matching DictWriter's restval default); positional rows are
        taken as already ordered.
        """
        if isinstance(row, Mapping):
            unknown = set(row) - set(self.col_names)
            if unknown:
                raise ValueError(f"row contains fields not in the schema: {sorted(unknown)}")
            return tuple(row.get(c, "") for c in self.col_names)
        vals = tuple(row)
        if len(vals) != len(self.col_names):
            raise ValueError(f"positional row has {len(vals)} cells, schema has {len(self.col_names)}")
        return vals

    def write(self, row: Mapping | Iterable) -> None:
        """Emit one row, given as a column-keyed mapping or ordered values."""
        assert self._sink.writable()
        self._emit(self._ordered(row))

    def writerows(self, rows: Sequence[Mapping | Iterable]) -> None:
        """Emit a batch of rows (at least one)."""
        assert self._sink.writable()
        assert len(rows) > 0
        for row in rows:
            self._emit(self._ordered(row))

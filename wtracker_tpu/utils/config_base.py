"""Dataclass configuration base with JSON / pickle persistence.

Capability parity with the reference ``wtracker/utils/config_base.py:12-113``.
Two reference quirks are preserved because persisted files depend on them:

* ``save_json`` serializes ``__dict__`` — i.e. *derived* fields computed in
  ``__post_init__`` are stored in the JSON (config_base.py:45-53).
* ``load_json`` bypasses ``__init__``/``__post_init__`` entirely via
  ``cls.__new__`` + ``__dict__.update`` (config_base.py:34-36), so round-tripped
  configs keep their stored derived fields verbatim.

Unlike the reference, a missing ``path`` only opens a GUI file dialog when a
display is actually available; headless environments get a clear error instead
of a tkinter crash.
"""

from __future__ import annotations

import json
from dataclasses import MISSING, dataclass, fields, is_dataclass
from pathlib import Path
from typing import TypeVar

T = TypeVar("T", bound="ConfigBase")


def _resolve_path(path: str | None, title: str, save: bool) -> str:
    if path is not None:
        return path
    from wtracker_tpu.utils.gui_utils import UserPrompt  # lazy: tkinter optional

    if save:
        return UserPrompt.save_file(title=title, file_types=[("json", ".json")], defaultextension=".json")
    return UserPrompt.open_file(title=title, file_types=[("json", ".json")])


@dataclass
class ConfigBase:
    """Base class for all persistable configuration dataclasses."""

    @classmethod
    def load_json(cls: type[T], path: str | None = None) -> T:
        path = _resolve_path(path, f"Open {cls.__name__} File", save=False)
        with open(path, "r") as f:
            data = json.load(f)
        obj = cls.__new__(cls)
        obj.__dict__.update(data)
        return obj

    def save_json(self, path: str | None = None) -> None:
        path = _resolve_path(path, f"Save {type(self).__name__} As", save=True)
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.__dict__, f, indent=4)

    @classmethod
    def load_pickle(cls: type[T], path: str | None = None) -> T:
        from wtracker_tpu.utils.io_utils import pickle_load_object

        path = _resolve_path(path, f"Open {cls.__name__} File", save=False)
        return pickle_load_object(path)

    def save_pickle(self, path: str | None = None) -> None:
        from wtracker_tpu.utils.io_utils import pickle_save_object

        path = _resolve_path(path, f"Save {type(self).__name__} As", save=True)
        pickle_save_object(self, path)


def print_initialization(cls, include_default: bool = True, init_fields_only: bool = True) -> str:
    """Emit a fill-in-the-blanks constructor call for a config dataclass.

    Mirror of the reference codegen helper (config_base.py:91-113); returns the
    text as well as printing it.
    """
    if not is_dataclass(cls):
        raise TypeError(f"{cls.__name__} is not a dataclass")

    lines = [f"{cls.__name__}("]
    for f in fields(cls):
        if init_fields_only and f.init is False:
            continue
        has_default = f.default is not MISSING
        val = f.default if (include_default and has_default) else None
        if isinstance(val, str):
            val = f'"{val}"'
        lines.append(f"    {f.name} = {val}, # {f.type}")
    lines.append(")")
    text = "\n".join(lines)
    print(text)
    return text

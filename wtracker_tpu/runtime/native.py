"""ctypes bindings + on-demand build of the native frame loader.

The C++ library is compiled once with the system toolchain (g++ -O3) into the
user cache directory; all consumers gracefully fall back to OpenCV when the
toolchain or the .so is unavailable, so the native path is a pure
acceleration, never a requirement.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).with_name("frame_loader.cpp")
_lib = None
_lib_error: str | None = None


def _build_lib() -> Path:
    src = _SRC.read_bytes()
    tag = hashlib.sha1(src).hexdigest()[:12]
    cache_dir = Path(os.environ.get("WTRACKER_TPU_CACHE", Path.home() / ".cache" / "wtracker_tpu"))
    cache_dir.mkdir(parents=True, exist_ok=True)
    so_path = cache_dir / f"frame_loader_{tag}.so"
    if so_path.exists():
        return so_path

    tmp = so_path.with_suffix(".tmp.so")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread", str(_SRC), "-o", str(tmp)]
    subprocess.run(cmd, check=True, capture_output=True)
    tmp.replace(so_path)
    return so_path


def get_lib():
    """The loaded native library, or ``None`` when unavailable."""
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    try:
        path = _build_lib()
        lib = ctypes.CDLL(str(path))
        lib.wt_probe_bmp.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.wt_probe_bmp.restype = ctypes.c_int
        lib.wt_load_batch_bmp.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.wt_load_batch_bmp.restype = ctypes.c_int
        lib.wt_load_batch_bmp_window.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.wt_load_batch_bmp_window.restype = ctypes.c_int
        _lib = lib
    except Exception as e:  # no toolchain / unsupported platform
        _lib_error = str(e)
        _lib = None
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def probe_bmp(path: str) -> tuple[int, int, int]:
    """(h, w, channels) of a BMP file via the native prober."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_lib_error}")
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.wt_probe_bmp(path.encode(), ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
    if rc != 0:
        raise ValueError(f"failed to probe BMP {path} (code {rc})")
    return h.value, w.value, c.value


def load_batch_bmp(
    paths: list[str],
    h: int,
    w: int,
    gray: bool = True,
    n_threads: int | None = None,
    out: np.ndarray | None = None,
) -> np.ndarray:
    """Decode many BMPs in parallel into one contiguous uint8 array.

    Args:
        paths: BMP file paths; all frames must be (h, w).
        gray: single-channel output (OpenCV-exact BGR→gray weights).
        n_threads: decoder threads (default: cpu count, capped at 16).
        out: optional preallocated output of the right shape.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_lib_error}")

    n = len(paths)
    shape = (n, h, w) if gray else (n, h, w, 3)
    if out is None:
        out = np.empty(shape, dtype=np.uint8)
    assert out.shape == shape and out.dtype == np.uint8 and out.flags["C_CONTIGUOUS"]

    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)

    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    frame_stride = h * w * (1 if gray else 3)
    rc = lib.wt_load_batch_bmp(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        frame_stride,
        h,
        w,
        1 if gray else 0,
        n_threads,
    )
    if rc != 0:
        raise ValueError(f"BMP batch decode failed (code {rc})")
    return out


def load_batch_bmp_window(
    paths: list[str],
    full_h: int,
    full_w: int,
    top_lefts: np.ndarray,
    win_h: int,
    win_w: int,
    gray: bool = True,
    n_threads: int | None = None,
    out: np.ndarray | None = None,
) -> np.ndarray:
    """Decode one ``(win_h, win_w)`` window per BMP in parallel (ROI streaming).

    BMP rows are contiguous on disk, so each window costs one seek + one read
    of ``win_h`` full rows — a tracker that only looks at a camera-sized view
    never reads the rest of the frame.

    Args:
        paths: BMP file paths; all frames must be (full_h, full_w).
        top_lefts: (N, 2) int window origins in (x, y) order, one per frame;
            windows must lie fully inside the frame.
        gray: single-channel output (OpenCV-exact BGR→gray weights).
        out: optional preallocated output of shape (N, win_h, win_w[, 3]).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_lib_error}")

    n = len(paths)
    tls = np.ascontiguousarray(np.asarray(top_lefts, dtype=np.int32).reshape(n, 2))
    shape = (n, win_h, win_w) if gray else (n, win_h, win_w, 3)
    if out is None:
        out = np.empty(shape, dtype=np.uint8)
    assert out.shape == shape and out.dtype == np.uint8 and out.flags["C_CONTIGUOUS"]

    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)

    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    x0s = np.ascontiguousarray(tls[:, 0])
    y0s = np.ascontiguousarray(tls[:, 1])
    frame_stride = win_h * win_w * (1 if gray else 3)
    rc = lib.wt_load_batch_bmp_window(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        frame_stride,
        full_h,
        full_w,
        x0s.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        y0s.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        win_h,
        win_w,
        1 if gray else 0,
        n_threads,
    )
    if rc != 0:
        raise ValueError(f"BMP window batch decode failed (code {rc})")
    return out

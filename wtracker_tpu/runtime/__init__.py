"""Native runtime components (C++ via ctypes): parallel frame decoding."""

from wtracker_tpu.runtime.native import load_batch_bmp, native_available, probe_bmp

__all__ = ["load_batch_bmp", "native_available", "probe_bmp"]

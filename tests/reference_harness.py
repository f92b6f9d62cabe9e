"""Import harness for the upstream reference implementation (golden oracle).

The reference at /root/reference is used READ-ONLY as a behavioral oracle in
parity tests: we run its Simulator/controllers on synthetic data and demand our
rebuild produce identical logs.  Its unavailable heavy deps (ultralytics,
mealpy) are stubbed since the code paths under test never touch them.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def import_reference():
    """Make the reference ``wtracker`` package importable; returns its module."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    if "ultralytics" not in sys.modules:
        stub = types.ModuleType("ultralytics")
        stub.YOLO = object  # only referenced in type annotations / YoloConfig
        sys.modules["ultralytics"] = stub

    # the reference's vlc.py force-switches matplotlib to a Qt backend, which
    # this headless image lacks — redirect any Qt backend request to Agg
    import matplotlib

    if not getattr(matplotlib, "_wt_use_patched", False):
        _orig_use = matplotlib.use

        def _use(backend, *a, **k):
            if "qt" in str(backend).lower():
                backend = "Agg"
            return _orig_use(backend, *a, **k)

        matplotlib.use = _use
        matplotlib._wt_use_patched = True

    import wtracker

    return wtracker


def make_reference_configs(exp_kwargs: dict, timing_kwargs: dict):
    """Build reference ExperimentConfig/TimingConfig from plain kwargs."""
    import_reference()
    from wtracker.sim.config import ExperimentConfig, TimingConfig

    exp = ExperimentConfig(**exp_kwargs)
    timing = TimingConfig(experiment_config=exp, **timing_kwargs)
    return exp, timing

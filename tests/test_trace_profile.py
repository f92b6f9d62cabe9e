"""tools/trace_profile.py xplane parsing — the device-trace methodology's
reusable half (the TPU-only measurement itself can't run on the CPU mesh;
docs/performance.md round 3 records the on-hardware numbers)."""

import os
import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_profile import parse_xspace  # noqa: E402


def test_parse_xspace_missing_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        parse_xspace(str(tmp_path))


def test_parse_xspace_walks_cpu_trace(tmp_path):
    """A real (CPU) trace parses cleanly; CPU planes carry no 'XLA Modules'
    line, so device totals are zero — the tool exits with a clear message in
    that case instead of reporting a bogus 0 ms ceiling."""
    f = jax.jit(lambda x: jnp.tanh(x @ x.T).sum())
    x = jnp.ones((64, 64), jnp.float32)
    _ = float(f(x))
    with jax.profiler.trace(str(tmp_path)):
        _ = float(f(x))

    module_ps, op_ps, op_n = parse_xspace(str(tmp_path))
    assert module_ps == 0 and op_ps == {} and op_n == {}


def test_trace_diff_normalize_groups_instances():
    """tools/trace_diff groups fusion instances across compiles: counter
    suffixes and HLO '%' sigils strip, distinct ops stay distinct."""
    from tools.trace_diff import _normalize

    assert _normalize("fusion.123") == "fusion"
    assert _normalize("%convolution.42") == "convolution"
    assert _normalize("jit_step/fusion") == "jit_step/fusion"
    assert _normalize("copy.1") != _normalize("fusion.1")

"""Diff two xplane traces op-by-op: where did the device time move?

Pairs with tools/trace_profile.py (run each variant with a distinct
--trace-dir), groups the "XLA Ops" lines by a normalized fusion name, and
prints the largest deltas — the fastest way to see which stages a lowering
change (batch fold, render fusion, chunking) actually sped up or regressed.

Usage::

    python tools/trace_diff.py /tmp/trace-a /tmp/trace-b [--top 20]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.trace_profile import parse_xspace


def _normalize(name: str) -> str:
    """Strip instance counters so the same logical fusion matches across
    compiles: 'fusion.123' -> 'fusion', '%convolution.42' -> 'convolution'."""
    name = name.split("%")[-1]
    return re.sub(r"\.\d+$", "", name)


def load(trace_dir: str):
    module_ps, op_ps, _ = parse_xspace(trace_dir)
    grouped: dict[str, float] = {}
    for name, ps in op_ps.items():
        key = _normalize(name)
        grouped[key] = grouped.get(key, 0.0) + ps / 1e9
    return module_ps / 1e9, grouped


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("trace_a")
    ap.add_argument("trace_b")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    ms_a, ops_a = load(args.trace_a)
    ms_b, ops_b = load(args.trace_b)
    if ms_a == 0 or ms_b == 0:
        print("one of the traces has no device plane (CPU run?)", file=sys.stderr)
        sys.exit(1)

    print(f"A = {args.trace_a}: {ms_a:.1f} ms device total")
    print(f"B = {args.trace_b}: {ms_b:.1f} ms device total   (B-A: {ms_b - ms_a:+.1f} ms)")

    keys = set(ops_a) | set(ops_b)
    deltas = sorted(keys, key=lambda k: -abs(ops_b.get(k, 0.0) - ops_a.get(k, 0.0)))
    print(f"\n{'delta ms':>9} {'A ms':>8} {'B ms':>8}  op")
    for k in deltas[: args.top]:
        a, b = ops_a.get(k, 0.0), ops_b.get(k, 0.0)
        print(f"{b - a:>+9.2f} {a:>8.2f} {b:>8.2f}  {k[:90]}")


if __name__ == "__main__":
    main()

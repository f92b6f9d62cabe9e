#!/usr/bin/env python
"""Closed-loop simulation over a logged trajectory (reference: simulate.ipynb).

Replays a worm trajectory (``init_bboxes.csv`` style log) through a chosen
controller and writes the resulting ``bboxes.csv``.  ``--backend engine`` runs
the TPU scan engine (fast path); ``--backend host`` runs the hook-based
simulator (reference-identical event loop).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--timing-config", required=True, help="TimingConfig json")
    ap.add_argument("--exp-config", required=True, help="ExperimentConfig json")
    ap.add_argument("--worm-csv", required=True, help="trajectory log (wrm_* columns)")
    ap.add_argument("--output", required=True, help="output folder for bboxes.csv")
    ap.add_argument("--controller", default="polyfit", choices=["csv", "optimal", "polyfit", "mlp"])
    ap.add_argument("--backend", default="engine", choices=["engine", "host"])
    ap.add_argument("--polyfit-config", help="PolyfitConfig json (controller=polyfit)")
    ap.add_argument("--predictor", help="predictor .npz/.pt checkpoint (controller=mlp)")
    args = ap.parse_args()

    import numpy as np
    import pandas as pd

    from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig

    timing = TimingConfig.load_json(args.timing_config)
    exp = ExperimentConfig.load_json(args.exp_config)

    if args.backend == "host":
        from wtracker_tpu.sim.controllers import (
            CsvController,
            LogConfig,
            LoggingController,
            MLPController,
            OptimalController,
            PolyfitConfig,
            PolyfitController,
        )
        from wtracker_tpu.sim.simulator import Simulator

        if args.controller == "csv":
            inner = CsvController(timing, args.worm_csv)
        elif args.controller == "optimal":
            inner = OptimalController(timing, args.worm_csv)
        elif args.controller == "polyfit":
            cfg = PolyfitConfig.load_json(args.polyfit_config) if args.polyfit_config else PolyfitConfig(
                degree=2, sample_times=[-15, -10, -5, 0, 3]
            )
            inner = PolyfitController(timing, cfg, args.worm_csv)
        else:
            from wtracker_tpu.models.resmlp import load_predictor, load_torch_checkpoint

            pred = (
                load_torch_checkpoint(args.predictor)
                if args.predictor.endswith(".pt")
                else load_predictor(args.predictor)
            )
            inner = MLPController(timing, args.worm_csv, pred)

        ctl = LoggingController(inner, LogConfig(root_folder=args.output, save_err_view=False))
        Simulator(timing, exp, ctl).run()
        print(f"wrote {args.output}/bboxes.csv")
        return

    # engine backend
    from wtracker_tpu.sim.engine import (
        EngineParams,
        csv_controller,
        headless_frame_shape,
        logs_to_frame,
        mlp_controller,
        optimal_controller,
        polyfit_controller,
        run_engine,
    )

    params = EngineParams.from_timing(timing, headless_frame_shape(timing, exp.orig_resolution))
    csv_data = pd.read_csv(args.worm_csv)[["wrm_x", "wrm_y", "wrm_w", "wrm_h"]].to_numpy(dtype=float)

    if args.controller == "csv":
        ctl = csv_controller(csv_data, params)
    elif args.controller == "optimal":
        ctl = optimal_controller(csv_data, params)
    elif args.controller == "polyfit":
        from wtracker_tpu.sim.controllers import PolyfitConfig

        cfg = PolyfitConfig.load_json(args.polyfit_config) if args.polyfit_config else PolyfitConfig(
            degree=2, sample_times=[-15, -10, -5, 0, 3]
        )
        ctl = polyfit_controller(csv_data, params, np.array(cfg.sample_times), np.array(cfg.weights), cfg.degree)
    else:
        from wtracker_tpu.models.resmlp import load_predictor, load_torch_checkpoint
        from wtracker_tpu.sim.controllers import MLPController

        pred = (
            load_torch_checkpoint(args.predictor)
            if args.predictor.endswith(".pt")
            else load_predictor(args.predictor)
        )
        host_ctl = MLPController(timing, args.worm_csv, pred)
        ctl = mlp_controller(csv_data, params, pred, host_ctl.max_dist_per_pred)

    n_cycles = params.n_logged_cycles(exp.num_frames)
    logs = run_engine(params, ctl, exp.init_position, n_cycles)
    df = logs_to_frame(params, logs)

    from wtracker_tpu.utils.path_utils import create_directory, join_paths

    create_directory(args.output)
    out = join_paths(args.output, "bboxes.csv")
    df.to_csv(out, index=False)
    print(f"wrote {out} ({len(df)} rows, {n_cycles} cycles)")


if __name__ == "__main__":
    main()

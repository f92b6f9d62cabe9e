#!/usr/bin/env python
"""Train the ResMLP movement predictor (reference: predictor_training.ipynb).

Builds (bbox history → future center) samples from detection logs and fits an
RMLP with the scan-compiled optax trainer.  Reference recipe: batch 128, Adam
lr 1e-3, wd 1e-5, MSE, ≤100 epochs, early-stop 15.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--logs", required=True, nargs="+", help="bboxes.csv log(s)")
    ap.add_argument("--output", required=True, help="checkpoint output (.npz)")
    ap.add_argument("--input-frames", type=int, nargs="+", default=[0, -3, -6, -9, -12, -15, -18, -21, -24, -27, -30, -33, -36, -39, -42, -45])
    ap.add_argument("--pred-frames", type=int, nargs="+", default=[3, 6, 9, 12])
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--weight-decay", type=float, default=1e-5)
    ap.add_argument("--early-stopping", type=int, default=15)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from wtracker_tpu.neural import DatasetConfig, TrainConfig, fit_from_config

    cfg = TrainConfig(
        dataset=DatasetConfig(
            input_frames=args.input_frames, pred_frames=args.pred_frames, log_path=args.logs
        ),
        model=None,
        loss_fn="mse",
        optimizer="adam",
        num_epochs=args.epochs,
        checkpoints=args.output,
        early_stopping=args.early_stopping,
        print_every=5,
        learning_rate=args.lr,
        weight_decay=args.weight_decay,
        batch_size=args.batch,
        seed=args.seed,
    )
    trainer, result = fit_from_config(cfg)
    print(f"trained {result.num_epochs} epochs; best checkpoint at {args.output}")


if __name__ == "__main__":
    main()

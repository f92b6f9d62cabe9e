"""wtracker_tpu — a TPU-native closed-loop worm-tracking framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the WTracker
reference platform (worm-tracking microscope simulator + ML tooling):

- ``wtracker_tpu.sim``     — closed-loop simulator: a hook-based host `Simulator`
  (API parity) and a `lax.scan` cycle engine (TPU-native hot path).
- ``wtracker_tpu.models``  — Flax ResMLP movement predictor and YOLOv8 detector.
- ``wtracker_tpu.ops``     — jittable box/image/polyfit/NMS/morphology kernels.
- ``wtracker_tpu.neural``  — optax training loop, dataset building, configs.
- ``wtracker_tpu.dataset`` — background extraction, classical bbox bootstrap,
  sample extraction for detector training.
- ``wtracker_tpu.eval``    — log analysis, error metrics, plotting, replay.
- ``wtracker_tpu.parallel``— device-mesh helpers for multi-chip scale-out.
- ``wtracker_tpu.utils``   — configs, frame IO, bbox utilities, logging.

Precision note: the package enables ``jax_enable_x64`` at import time (opt out
with env ``WTRACKER_TPU_NO_X64=1``).  The closed-loop control math (sine-motor
rounding, polynomial fits) must be bit-compatible with the float64 reference
semantics to reproduce identical CSV logs; all performance-critical model code
is explicitly typed bf16/f32 and is unaffected.
"""

from __future__ import annotations

import os

import jax

if not os.environ.get("WTRACKER_TPU_NO_X64"):
    jax.config.update("jax_enable_x64", True)

# Reliable platform pinning: the JAX_PLATFORMS env var is ignored by some PJRT
# plugins (the axon TPU plugin among them) — the config update is honored.
if os.environ.get("WTRACKER_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["WTRACKER_TPU_PLATFORM"])

__version__ = "0.1.0"

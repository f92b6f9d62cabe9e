"""Background extraction from an experiment's frames.

Capability parity with the reference ``wtracker/dataset/bg_extractor.py:7-76``:
the background is the pixelwise median (or mean) over uniformly/randomly
sampled probe frames.  The reduction itself runs on device over a batched
probe stack (one ``jnp.median`` instead of a python accumulation loop).
"""

from __future__ import annotations

import numpy as np
from tqdm.auto import tqdm

from wtracker_tpu.utils.frame_reader import FrameReader


class BGExtractor:
    """Computes a static background image for a frame sequence."""

    def __init__(self, reader: FrameReader):
        self.reader = reader

    def calc_background(self, num_probes: int, sampling: str = "uniform", method: str = "median") -> np.ndarray:
        """Estimate the background.

        Args:
            num_probes: number of probe frames to sample.
            sampling: "uniform" (evenly spaced) or "random" probe selection.
            method: "median" (better) or "mean" (faster) pixelwise reduction.
        """
        assert sampling in ("random", "uniform")
        assert method in ("median", "mean")

        length = len(self.reader)
        size = min(num_probes, length)

        if sampling == "random":
            frame_ids = np.random.choice(length, size=size, replace=False)
        else:
            frame_ids = np.unique(np.linspace(0, length - 1, num=size).astype(int, copy=False))

        probes = np.empty((len(frame_ids), *self.reader.frame_shape), dtype=np.uint8)
        for i, frame_id in enumerate(
            tqdm(frame_ids, desc="Extracting background frames", unit="fr", disable=len(frame_ids) < 200)
        ):
            probes[i] = self.reader[int(frame_id)]

        import jax.numpy as jnp

        if method == "median":
            bg = jnp.median(jnp.asarray(probes), axis=0)
        else:
            bg = jnp.mean(jnp.asarray(probes, dtype=jnp.float64), axis=0)
        return np.asarray(bg).astype(np.uint8, copy=False)

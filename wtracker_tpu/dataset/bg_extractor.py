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

        import jax
        import jax.numpy as jnp

        # The reduction is per-pixel independent, so run it in row bands: a
        # full probe stack at reference geometry (1000 × 1400 × 1600) is
        # ~9 GB as f32 and the device median sorts it (~2-3× temps) — one
        # jnp.median over the whole stack OOMs a 16 GB chip. Band height is
        # sized so stack+sort temps stay ~1 GB; one compile serves all bands
        # (the last band is padded by clamping, then trimmed).
        frame_shape = probes.shape[1:]
        n, h = probes.shape[0], probes.shape[1]
        flat = probes.reshape(n, h, -1)  # channels fold into the row axis
        w = flat.shape[2]
        band = max(1, min(h, int(64 * 1024 * 1024 / max(n * w, 1))))

        if method == "median":
            reduce_band = jax.jit(lambda x: jnp.median(x, axis=0))
        else:
            reduce_band = jax.jit(lambda x: jnp.mean(x.astype(jnp.float64), axis=0))

        bg = np.empty((h, w), dtype=np.float64)
        for y0 in range(0, h, band):
            y1 = min(y0 + band, h)
            src = flat[:, y1 - band : y1, :]  # fixed shape: one compile
            bg[y0:y1] = np.asarray(reduce_band(jnp.asarray(src)))[band - (y1 - y0) :]
        return bg.reshape(frame_shape).astype(np.uint8, copy=False)

"""Batch→height folding: run small-image convolutions as one tall image.

The round-3 device trace (docs/performance.md) showed the detector's early
conv stages — (208², 104², 52²) feature maps with ≤128 channels at B≈360 —
lowering to batch-minor layouts that reach only 8-16% of the MXU, while the
same arithmetic at ≥256 channels runs channel-minor at 50-75%.  The FLOP and
HBM rooflines for those ops are ~1 ms; XLA's layout choice costs ~8 ms.

The fix here is pure XLA, no custom kernel: stack the batch along the height
axis with a few zero "seam" rows between images, so the convolution sees a
single (1, B·(H+seam), W, C) image.  With the seams zeroed, every output row
of every image computes from exactly the window contents it would see in the
batched form (zero seam rows stand in for the SAME-padding zeros), so the
result is bit-identical — the seams merely keep neighbouring images out of
each other's 3×3 windows.  Stride-2 convolutions additionally require each
image block to start at an even row, i.e. an even ``seam`` for even ``H``.

Contracts (asserted in tests/test_foldbatch.py):

* 3×3 stride-1 SAME conv: ``seam >= 1``, output rows ``[0, H)`` of each block
  valid, seam rows garbage.
* 3×3 stride-2 pad-1 conv: ``seam`` even, block ``H + seam`` even; output
  block is ``(H + seam) // 2`` rows of which the first ``H // 2`` are valid.
* k×k pooling/conv with SAME needs ``seam >= k // 2``.
* Seam rows must be (re-)zeroed before every spatial op — after a biased
  conv + activation they hold ``act(bias)``, not zero (:func:`seam_mask`).

Pointwise ops (1×1 convs, activations, concats, residuals) are oblivious to
folding and need no masking in between.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["fold_batch", "unfold_batch", "seam_mask", "folded_len"]


def folded_len(batch: int, h: int, seam: int) -> int:
    """Height of the folded image: ``batch * (h + seam)``."""
    return batch * (h + seam)


def fold_batch(x: jnp.ndarray, seam: int) -> jnp.ndarray:
    """(B, H, W, C) → (1, B·(H+seam), W, C) with ``seam`` zero rows appended
    below every image (the last image's seam doubles as its bottom padding).
    """
    b, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (0, seam), (0, 0), (0, 0)))
    return x.reshape(1, b * (h + seam), w, c)


def unfold_batch(y: jnp.ndarray, batch: int, valid_rows: int) -> jnp.ndarray:
    """(1, B·block, W, C) → (B, valid_rows, W, C), dropping seam rows.

    ``valid_rows`` is the per-image output height of the op(s) applied while
    folded (e.g. ``H`` after stride-1 convs, ``H // 2`` after one stride-2).
    """
    _, fh, w, c = y.shape
    block = fh // batch
    return y.reshape(batch, block, w, c)[:, :valid_rows]


def seam_mask(batch: int, valid_rows: int, seam: int, dtype=jnp.bfloat16) -> jnp.ndarray:
    """(B·(valid+seam), 1, 1) multiplicative mask zeroing the seam rows.

    Multiply a folded (1, FH, W, C) activation by this before the next ≥3×3
    spatial op: ``x = x * seam_mask(...)`` — XLA fuses it into the producing
    epilogue.
    """
    block = np.ones((valid_rows + seam,), np.float32)
    block[valid_rows:] = 0.0
    return jnp.asarray(np.tile(block, batch)[:, None, None], dtype)

"""Classical-CV ops on device: threshold, morphology, largest-blob bbox.

TPU-native replacement for the OpenCV pipeline the reference uses to bootstrap
detection datasets (box_calculator.py:75-101): background absdiff → binary
threshold → 5×5 morphological opening → 11×11 dilation → bbox of the largest
blob.  Erosion/dilation become min/max ``reduce_window`` ops; the largest
*connected component* is found with an iterative label-propagation
(min-neighbor flood) ``while_loop`` — all batched over frames with ``vmap``.

Matching OpenCV semantics:
* erode pads with +inf (borders don't erode), dilate pads with -inf;
* the reference ranks blobs by ``cv.contourArea`` (polygon area) — we rank by
  pixel count, identical for any clearly-largest blob (the single-worm case).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def erode(mask: jnp.ndarray, size: int) -> jnp.ndarray:
    """Binary erosion with a ``size``×``size`` all-ones kernel."""
    return jax.lax.reduce_window(
        mask.astype(jnp.float32),
        jnp.inf,
        jax.lax.min,
        (size, size),
        (1, 1),
        "SAME",
    ) > 0.5


def dilate(mask: jnp.ndarray, size: int) -> jnp.ndarray:
    """Binary dilation with a ``size``×``size`` all-ones kernel."""
    return jax.lax.reduce_window(
        mask.astype(jnp.float32),
        -jnp.inf,
        jax.lax.max,
        (size, size),
        (1, 1),
        "SAME",
    ) > 0.5


def opening(mask: jnp.ndarray, size: int) -> jnp.ndarray:
    """Morphological opening (erode → dilate)."""
    return dilate(erode(mask, size), size)


def _propagate_labels(labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """One step of min-label flooding over the 3×3 neighborhood."""
    neigh = jax.lax.reduce_window(labels, jnp.inf, jax.lax.min, (3, 3), (1, 1), "SAME")
    return jnp.where(mask, jnp.minimum(labels, neigh), jnp.inf)


def largest_component_bbox(mask: jnp.ndarray, max_iters: int = 512) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Bbox (x, y, w, h) of the largest connected component of a binary mask.

    Returns ``(bbox int32[4], found bool)``; bbox is (0, 0, 0, 0) when the
    mask is empty.  Label propagation runs until convergence (bounded by
    ``max_iters``), so cost scales with the largest blob's diameter.
    """
    h, w = mask.shape
    idx = (jnp.arange(h * w, dtype=jnp.float32)).reshape(h, w)
    labels = jnp.where(mask, idx, jnp.inf)

    def cond(state):
        labels, prev, it = state
        return (it < max_iters) & jnp.any(labels != prev)

    def body(state):
        labels, _, it = state
        return _propagate_labels(labels, mask), labels, it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (_propagate_labels(labels, mask), labels, jnp.int32(0)))

    # pixel counts per root label via scatter-add over the flat index space
    flat = jnp.where(jnp.isfinite(labels), labels, 0).astype(jnp.int32).reshape(-1)
    valid = mask.reshape(-1)
    counts = jnp.zeros(h * w, dtype=jnp.int32).at[flat].add(valid.astype(jnp.int32))
    best_label = jnp.argmax(counts)

    sel = (labels == best_label.astype(labels.dtype)) & mask
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    big = jnp.int32(1 << 30)
    x0 = jnp.min(jnp.where(sel, xs, big))
    y0 = jnp.min(jnp.where(sel, ys, big))
    x1 = jnp.max(jnp.where(sel, xs, -1))
    y1 = jnp.max(jnp.where(sel, ys, -1))

    found = jnp.any(sel)
    bbox = jnp.where(
        found,
        jnp.stack([x0, y0, x1 - x0 + 1, y1 - y0 + 1]),
        jnp.zeros(4, jnp.int32),
    ).astype(jnp.int32)
    return bbox, found


@partial(jax.jit, static_argnames=("diff_thresh", "open_size", "dilate_size"))
def worm_bbox_from_frame(
    frame: jnp.ndarray,
    background: jnp.ndarray,
    diff_thresh: int = 20,
    open_size: int = 5,
    dilate_size: int = 11,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The full bbox-bootstrap pipeline for one grayscale frame."""
    diff = jnp.abs(frame.astype(jnp.int32) - background.astype(jnp.int32))
    mask = diff > diff_thresh
    mask = opening(mask, open_size)
    mask = dilate(mask, dilate_size)
    return largest_component_bbox(mask)


@partial(jax.jit, static_argnames=("diff_thresh", "open_size", "dilate_size"))
def worm_bboxes_batch(
    frames: jnp.ndarray,
    background: jnp.ndarray,
    diff_thresh: int = 20,
    open_size: int = 5,
    dilate_size: int = 11,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched pipeline: (N, H, W) frames + (H, W) background → (N, 4) boxes."""

    def one(frame):
        return worm_bbox_from_frame(frame, background, diff_thresh, open_size, dilate_size)

    return jax.vmap(one)(frames)

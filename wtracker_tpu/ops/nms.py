"""TPU-friendly non-maximum suppression.

The reference's inference runs ``max_det=1`` (yolo_controller.py:75), for which
suppression degenerates to a score argmax — that fast path lives inside
:class:`~wtracker_tpu.models.yolov8.YoloV8Detector`.  This module provides the
general fixed-size greedy NMS for multi-detection use (dataset tooling,
evaluation): no dynamic shapes, a ``fori_loop`` over the ``max_det`` output
slots, vectorized IoU suppression per step — O(max_det · A) work that maps to
the VPU instead of the data-dependent loops of CPU/GPU NMS kernels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _iou_one_vs_many(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    tl = jnp.maximum(box[:2], boxes[:, :2])
    br = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.maximum(br - tl, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    area_a = jnp.maximum(box[2] - box[0], 0.0) * jnp.maximum(box[3] - box[1], 0.0)
    area_b = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.maximum(boxes[:, 3] - boxes[:, 1], 0.0)
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


@partial(jax.jit, static_argnames=("max_det",))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.45,
    score_threshold: float = 0.1,
    max_det: int = 100,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over one image.

    Args:
        boxes: (A, 4) xyxy candidates.
        scores: (A,) confidence per candidate.
        iou_threshold: candidates overlapping a kept box above this are dropped.
        score_threshold: candidates below this never get selected.
        max_det: static output size.

    Returns:
        (max_det, 4) boxes, (max_det,) scores, (max_det,) validity mask.
        Invalid slots hold zeros.
    """
    live = scores >= score_threshold

    def body(_, state):
        live, out_boxes, out_scores, out_valid, slot = state
        masked = jnp.where(live, scores, -jnp.inf)
        idx = jnp.argmax(masked)
        best = scores[idx]
        ok = live[idx] & (best >= score_threshold)

        box = boxes[idx]
        suppress = _iou_one_vs_many(box, boxes) > iou_threshold
        live = live & ~suppress & (jnp.arange(boxes.shape[0]) != idx)

        out_boxes = jnp.where(ok, out_boxes.at[slot].set(box), out_boxes)
        out_scores = jnp.where(ok, out_scores.at[slot].set(best), out_scores)
        out_valid = jnp.where(ok, out_valid.at[slot].set(True), out_valid)
        return live, out_boxes, out_scores, out_valid, slot + ok.astype(jnp.int32)

    state = (
        live,
        jnp.zeros((max_det, 4), boxes.dtype),
        jnp.zeros((max_det,), scores.dtype),
        jnp.zeros((max_det,), bool),
        jnp.int32(0),
    )
    _, out_boxes, out_scores, out_valid, _ = jax.lax.fori_loop(0, max_det, body, state)
    return out_boxes, out_scores, out_valid


batched_nms = jax.vmap(nms, in_axes=(0, 0, None, None, None))
"""NMS over a batch: (B, A, 4), (B, A) → per-image fixed-size outputs."""

"""Jittable bounding-box operations (device / jax.numpy side).

Twin of :mod:`wtracker_tpu.utils.bbox` for use inside jitted code — the engine,
detector post-processing and the error kernels.  All functions are pure, work on
``(..., 4)`` arrays, and are safe under ``jit``/``vmap`` (no data-dependent
shapes; NaN boxes flow through and are masked by callers, mirroring the
reference's missing-detection protocol (csv_controller.py:32-34)).
"""

from __future__ import annotations

import jax.numpy as jnp

from wtracker_tpu.utils.bbox import BoxFormat

__all__ = [
    "BoxFormat",
    "to_xyxy",
    "to_xywh",
    "to_yolo",
    "center",
    "round_boxes",
    "discretize",
    "box_iou",
    "intersect_area",
]


def to_xyxy(bbox: jnp.ndarray, src_format: BoxFormat = BoxFormat.XYWH) -> jnp.ndarray:
    if src_format == BoxFormat.XYXY:
        return bbox
    xy = bbox[..., :2]
    if src_format == BoxFormat.YOLO:
        xy = xy - bbox[..., 2:] / 2
    return jnp.concatenate([xy, xy + bbox[..., 2:]], axis=-1)


def to_xywh(bbox: jnp.ndarray, src_format: BoxFormat = BoxFormat.XYXY) -> jnp.ndarray:
    if src_format == BoxFormat.XYWH:
        return bbox
    if src_format == BoxFormat.XYXY:
        return jnp.concatenate([bbox[..., :2], bbox[..., 2:] - bbox[..., :2]], axis=-1)
    return jnp.concatenate([bbox[..., :2] - bbox[..., 2:] / 2, bbox[..., 2:]], axis=-1)


def to_yolo(bbox: jnp.ndarray, src_format: BoxFormat) -> jnp.ndarray:
    if src_format == BoxFormat.YOLO:
        return bbox
    wh = bbox[..., 2:] - bbox[..., :2] if src_format == BoxFormat.XYXY else bbox[..., 2:]
    return jnp.concatenate([bbox[..., :2] + wh / 2, wh], axis=-1)


def center(bboxes: jnp.ndarray, box_format: BoxFormat = BoxFormat.XYWH) -> jnp.ndarray:
    b = to_xywh(bboxes, box_format)
    return b[..., :2] + b[..., 2:] / 2


def round_boxes(bboxes: jnp.ndarray, box_format: BoxFormat) -> jnp.ndarray:
    """Outward-round to integer pixels: floor the top-left, ceil the bottom-right."""
    b = to_xyxy(bboxes, box_format)
    tl = jnp.floor(b[..., :2]).astype(jnp.int32)
    br = jnp.ceil(b[..., 2:]).astype(jnp.int32)
    out = jnp.concatenate([tl, br], axis=-1)
    if box_format == BoxFormat.XYXY:
        return out
    return to_xywh(out, BoxFormat.XYXY) if box_format == BoxFormat.XYWH else to_yolo(out, BoxFormat.XYXY)


def discretize(
    bboxes: jnp.ndarray,
    bounds: tuple[int, int],
    box_format: BoxFormat,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Jit-safe twin of utils.bbox.discretize: clamp + legality mask, zeros for illegal."""
    finite = jnp.isfinite(bboxes).all(axis=-1)
    bboxes = jnp.where(finite[..., None], bboxes, 0.0)

    b = round_boxes(to_xyxy(bboxes, box_format), BoxFormat.XYXY)
    h, w = bounds
    x = jnp.clip(b[..., 0::2], 0, w)
    y = jnp.clip(b[..., 1::2], 0, h)
    b = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], axis=-1)

    is_legal = finite & (b[..., 2] > b[..., 0]) & (b[..., 3] > b[..., 1])
    b = jnp.where(is_legal[..., None], b, 0).astype(jnp.int32)
    if box_format != BoxFormat.XYXY:
        b = to_xywh(b, BoxFormat.XYXY) if box_format == BoxFormat.XYWH else to_yolo(b, BoxFormat.XYXY)
    return b, is_legal


def intersect_area(a_xyxy: jnp.ndarray, b_xyxy: jnp.ndarray) -> jnp.ndarray:
    """Elementwise intersection area of two aligned box arrays (XYXY)."""
    tl = jnp.maximum(a_xyxy[..., :2], b_xyxy[..., :2])
    br = jnp.minimum(a_xyxy[..., 2:], b_xyxy[..., 2:])
    wh = jnp.maximum(br - tl, 0)
    return wh[..., 0] * wh[..., 1]


def box_iou(a_xyxy: jnp.ndarray, b_xyxy: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of two aligned box arrays (XYXY)."""
    inter = intersect_area(a_xyxy, b_xyxy)
    area_a = (a_xyxy[..., 2] - a_xyxy[..., 0]) * (a_xyxy[..., 3] - a_xyxy[..., 1])
    area_b = (b_xyxy[..., 2] - b_xyxy[..., 0]) * (b_xyxy[..., 3] - b_xyxy[..., 1])
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)

"""Image ops shaped for the MXU: matmul-form resizing, letterboxing, crops.

TPU-native replacements for the reference's OpenCV preprocessing
(view_controller.py:52-61 padding/crops; ultralytics letterbox resize).

The key trick: for static shapes, bilinear resize is two constant
interpolation matrices — ``out = A_h @ x @ A_wᵀ`` — which XLA executes on the
MXU instead of the gather machinery generic resize lowers to.  The matrices
are built once at trace time (numpy) and folded into the program.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix (half-pixel centers,
    matching ``jax.image.resize``/OpenCV INTER_LINEAR conventions)."""
    out = np.zeros((n_out, n_in), dtype=np.float32)
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        lo = int(np.floor(src))
        frac = src - lo
        lo_c = np.clip(lo, 0, n_in - 1)
        hi_c = np.clip(lo + 1, 0, n_in - 1)
        out[i, lo_c] += 1.0 - frac
        out[i, hi_c] += frac
    return out


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of ``(..., H, W[, C])`` images via two matmuls.

    Channel-last inputs are handled by contracting over the spatial axes
    explicitly, so any leading batch dims are supported.
    """
    h_out, w_out = out_hw
    has_c = x.ndim >= 3 and x.shape[-1] in (1, 3, 4) and x.shape[-2] != x.shape[-1]
    # treat trailing axis as channels only when a (..., H, W, C) layout is clear
    if x.ndim >= 3 and x.shape[-1] in (1, 3):
        h_in, w_in = x.shape[-3], x.shape[-2]
        a_h = jnp.asarray(_interp_matrix(h_in, h_out))
        a_w = jnp.asarray(_interp_matrix(w_in, w_out))
        y = jnp.einsum("oh,...hwc->...owc", a_h, x.astype(jnp.float32))
        return jnp.einsum("pw,...owc->...opc", a_w, y)
    h_in, w_in = x.shape[-2], x.shape[-1]
    a_h = jnp.asarray(_interp_matrix(h_in, h_out))
    a_w = jnp.asarray(_interp_matrix(w_in, w_out))
    y = jnp.einsum("oh,...hw->...ow", a_h, x.astype(jnp.float32))
    return jnp.einsum("pw,...ow->...op", a_w, y)


def letterbox(
    frames: jnp.ndarray,
    imgsz: tuple[int, int],
    pad_value: float = 114 / 255.0,
    dtype=jnp.float32,
) -> tuple[jnp.ndarray, tuple[float, int, int]]:
    """Ratio-preserving resize + center padding of (B, H, W[, C]) frames.

    Returns normalized (B, h, w, 3) ``dtype`` in [0, 1] plus the (scale,
    pad_top, pad_left) geometry for mapping boxes back.  Gray inputs broadcast
    to 3 channels (the reference converts gray→BGR before YOLO).

    Fusion tricks keeping the hot path lean: the 1/255 normalization is
    folded into the row interpolation matrix (no separate full-plane
    multiply); grayscale inputs are resized as ONE channel and broadcast to 3
    only after padding (3× less resize work — the channels are identical
    anyway); and with ``dtype=bfloat16`` the resize runs on the MXU in bf16
    with f32 accumulation, halving the preprocessing memory traffic for
    bf16-compute detectors.
    """
    gray = frames.ndim == 3 or frames.shape[-1] == 1
    if frames.ndim == 4 and frames.shape[-1] == 1:
        frames = frames[..., 0]

    sh, sw = frames.shape[1:3]
    dh, dw = imgsz
    scale = min(dh / sh, dw / sw)
    new_h, new_w = round(sh * scale), round(sw * scale)
    pad_top = (dh - new_h) // 2
    pad_left = (dw - new_w) // 2
    pad_hw = ((0, 0), (pad_top, dh - new_h - pad_top), (pad_left, dw - new_w - pad_left))

    a_h = jnp.asarray(_interp_matrix(sh, new_h) * np.float32(1.0 / 255.0), dtype=dtype)
    a_w = jnp.asarray(_interp_matrix(sw, new_w), dtype=dtype)
    src = frames.astype(dtype)

    if gray:
        y = jnp.einsum("oh,bhw->bow", a_h, src, preferred_element_type=jnp.float32)
        y = jnp.einsum("pw,bow->bop", a_w, y.astype(dtype), preferred_element_type=jnp.float32)
        y = jnp.pad(y.astype(dtype), pad_hw, constant_values=pad_value)
        x = jnp.broadcast_to(y[..., None], (*y.shape, 3))
    else:
        y = jnp.einsum("oh,bhwc->bowc", a_h, src, preferred_element_type=jnp.float32)
        y = jnp.einsum("pw,bowc->bopc", a_w, y.astype(dtype), preferred_element_type=jnp.float32)
        x = jnp.pad(y.astype(dtype), (*pad_hw, (0, 0)), constant_values=pad_value)
    return x, (scale, pad_top, pad_left)


def make_letterbox_matrices(
    src_hws: list[tuple[int, int]],
    canvas_hw: tuple[int, int],
    imgsz: tuple[int, int],
    dtype=jnp.float32,
):
    """Per-geometry letterbox operators for mixed-size view batches.

    Each source geometry ``(h, w)`` (content living in the top-left of a
    shared ``canvas_hw`` canvas) gets a row matrix (imgsz_h, canvas_h) and a
    column matrix (imgsz_w, canvas_w) that perform its ratio-preserving
    resize + center placement in one pair of matmuls; rows/columns landing in
    the letterbox padding are zero, and the returned coverage vectors supply
    the pad-value fill weight (``1 − cov_y ⊗ cov_x``).  The 1/255
    normalization folds into the row matrices exactly as in
    :func:`letterbox`, so single-geometry outputs are identical to it.

    Returns ``(mat_y, mat_x, cov_y, cov_x, geoms)`` stacked over geometries,
    with ``geoms`` the per-geometry ``(scale, pad_top, pad_left)``.
    """
    ch, cw = canvas_hw
    dh, dw = imgsz
    mat_y, mat_x, cov_y, cov_x, geoms = [], [], [], [], []
    for sh, sw in src_hws:
        if sh > ch or sw > cw:
            raise ValueError(f"source {(sh, sw)} exceeds the canvas {canvas_hw}")
        scale = min(dh / sh, dw / sw)
        new_h, new_w = round(sh * scale), round(sw * scale)
        pad_top = (dh - new_h) // 2
        pad_left = (dw - new_w) // 2

        my = np.zeros((dh, ch), dtype=np.float32)
        my[pad_top : pad_top + new_h, :sh] = _interp_matrix(sh, new_h) * np.float32(1.0 / 255.0)
        mx = np.zeros((dw, cw), dtype=np.float32)
        mx[pad_left : pad_left + new_w, :sw] = _interp_matrix(sw, new_w)

        cy = np.zeros((dh,), dtype=np.float32)
        cy[pad_top : pad_top + new_h] = 1.0
        cx = np.zeros((dw,), dtype=np.float32)
        cx[pad_left : pad_left + new_w] = 1.0

        mat_y.append(my)
        mat_x.append(mx)
        cov_y.append(cy)
        cov_x.append(cx)
        geoms.append((scale, pad_top, pad_left))
    return (
        jnp.asarray(np.stack(mat_y), dtype=dtype),
        jnp.asarray(np.stack(mat_x), dtype=dtype),
        jnp.asarray(np.stack(cov_y)),
        jnp.asarray(np.stack(cov_x)),
        geoms,
    )


def letterbox_indexed(
    views: jnp.ndarray,
    geom_ids: jnp.ndarray,
    mat_y: jnp.ndarray,
    mat_x: jnp.ndarray,
    cov_y: jnp.ndarray,
    cov_x: jnp.ndarray,
    pad_value: float = 114 / 255.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Letterbox a batch of canvas views, each by its own geometry's operator.

    Args:
        views: (B, canvas_h, canvas_w) grayscale views in [0, 255].
        geom_ids: (B,) index into the matrices from
            :func:`make_letterbox_matrices`.

    Returns normalized (B, imgsz_h, imgsz_w, 3) in [0, 1], identical per view
    to :func:`letterbox` on the native-size content.
    """
    a_h = jnp.take(mat_y, geom_ids, axis=0)  # (B, dh, ch)
    a_w = jnp.take(mat_x, geom_ids, axis=0)  # (B, dw, cw)
    src = views.astype(dtype)
    y = jnp.einsum("boh,bhw->bow", a_h, src, preferred_element_type=jnp.float32)
    y = jnp.einsum("bpw,bow->bop", a_w, y.astype(dtype), preferred_element_type=jnp.float32)
    fill = 1.0 - cov_y[geom_ids][:, :, None] * cov_x[geom_ids][:, None, :]
    y = y.astype(dtype) + (fill * pad_value).astype(dtype)
    return jnp.broadcast_to(y[..., None], (*y.shape, 3))


def replicate_pad(frame: jnp.ndarray, pad_xy: tuple[int, int]) -> jnp.ndarray:
    """Edge-replicate padding by (pad_x, pad_y) on each side — the world
    padding of the view controller (view_controller.py:52-61), jit-safe."""
    pad_x, pad_y = pad_xy
    widths = [(pad_y, pad_y), (pad_x, pad_x)] + [(0, 0)] * (frame.ndim - 2)
    return jnp.pad(frame, widths, mode="edge")


def crop_views(
    frames: jnp.ndarray, top_lefts: jnp.ndarray, view_hw: tuple[int, int]
) -> jnp.ndarray:
    """Batched dynamic crops: (B, H, W) frames + (B, 2) (x, y) → (B, h, w)."""

    def one(frame, tl):
        return jax.lax.dynamic_slice(frame, (tl[1], tl[0]), view_hw)

    return jax.vmap(one)(frames, top_lefts)

"""Pallas TPU kernel: fused camera-crop → bilinear-resize → normalize.

The video live loop's preprocessing chain (crop_views → letterbox →
normalize, engine_video.py) materializes two HBM intermediates per view —
the (cam, cam) uint8 crop and the (imgsz, imgsz, 3) f32 tensor.  This kernel
fuses the chain: per grid step it DMAs the crop window out of the resident
frame chunk (HBM → VMEM), runs the bilinear resize on the MXU, normalizes,
and writes the detector-ready bf16 view.

Square views resize with no padding (the letterbox of a square source is a
pure resize), which is the platform's actual configuration — camera views are
square (config.py:53-57: 4×4 mm).

Mosaic layout rules shape the implementation (see the Pallas guide): a DMA
slice of an int8 memref must start on the (32, 128) tile grid, but crop
positions are arbitrary.  So the kernel copies the *aligned superset window*
``(cam+32, cam+128)`` that starts on the tile grid, and folds the residual
(dy, dx) offset into the interpolation matrices, which are generated inside
the kernel with iota arithmetic (bilinear weights are an elementwise function
of |src − col|, so a shifted matrix is exactly as cheap as a static one).
Scalar per-view parameters (frame index, crop top-left) arrive via
``PrefetchScalarGridSpec`` so the DMA can issue before the body runs;
accumulation is f32 on the MXU with a bf16 store.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# int8 VMEM tile grid on TPU: 32 sublanes × 128 lanes
_TILE_H = 32
_TILE_W = 128


def tpu_backend_available() -> bool:
    """True when the default backend can lower Mosaic kernels.

    ``jax.default_backend() == "tpu"`` alone can miss nonstandard TPU
    plugins (the axon tunnel may report "axon"/"lite" platform strings), so
    match the same substrings the hardware tests accept
    (tests/test_pallas_preproc.py::_tpu_available).
    """
    try:
        name = jax.default_backend().lower()
        platform = jax.devices()[0].platform.lower()
    except Exception:
        return False
    return any(tag in name or tag in platform for tag in ("tpu", "axon", "lite"))


def _win_hw(cam: int) -> tuple[int, int]:
    """DMA window (h, w): covers cam plus the worst residual shift (tile−1),
    rounded up to tile multiples (Mosaic requires tile-aligned slice shapes)."""
    win_h = -_TILE_H * (-(cam + _TILE_H - 1) // _TILE_H)
    win_w = -_TILE_W * (-(cam + _TILE_W - 1) // _TILE_W)
    return win_h, win_w


def padded_chunk_hw(cam: int, h: int, w: int) -> tuple[int, int]:
    """Smallest (H, W) ≥ (h, w) for which every legal crop's aligned DMA
    window stays in-bounds.  The worst window starts at the largest
    tile-aligned position ≤ the largest legal crop start."""
    win_h, win_w = _win_hw(cam)
    worst_y = ((h - cam) // _TILE_H) * _TILE_H + win_h
    worst_x = ((w - cam) // _TILE_W) * _TILE_W + win_w
    return max(h, worst_y), max(w, worst_x)


def _shifted_interp(n_out: int, n_in: int, win: int, scale: float, shift) -> jnp.ndarray:
    """(n_out, win) bilinear matrix mapping window columns to outputs.

    Window column ``c`` holds source sample ``c − shift``; weights are the
    standard half-pixel-center bilinear hat function, with edge clamping that
    matches :func:`wtracker_tpu.ops.image._interp_matrix` (out-of-range source
    positions collapse their full weight onto the border sample).
    """
    # iota in i32 then widen — Mosaic rejects float iota
    outs = jax.lax.broadcasted_iota(jnp.int32, (n_out, win), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_out, win), 1).astype(jnp.float32)
    src = jnp.clip((outs + 0.5) * jnp.float32(scale) - 0.5, 0.0, float(n_in - 1))
    return jnp.maximum(0.0, 1.0 - jnp.abs(src + shift.astype(jnp.float32) - cols))


def _make_kernel(cam: int, imgsz: int, win_h: int, win_w: int):
    scale = cam / imgsz

    def kernel(idx_ref, tls_ref, frames_ref, out_ref, win_ref, sem):
        # Double-buffered pipeline: the window for view i+1 is DMAed from HBM
        # while view i runs its resize matmuls — the round-1 kernel serialized
        # start→wait→compute per grid step, which left the MXU idle for the
        # full DMA latency of every view (measured 1.6× slower than the
        # unfused path; docs/performance.md).  win_ref is (2, win_h, win_w)
        # and sem (2,): slot i%2 computes while slot (i+1)%2 fills.
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def view_dma(j, slot):
            tly_a = (tls_ref[j, 1] // _TILE_H) * _TILE_H
            tlx_a = (tls_ref[j, 0] // _TILE_W) * _TILE_W
            return pltpu.make_async_copy(
                frames_ref.at[idx_ref[j], pl.ds(tly_a, win_h), pl.ds(tlx_a, win_w)],
                win_ref.at[slot],
                sem.at[slot],
            )

        slot = jax.lax.rem(i, 2)
        next_slot = jax.lax.rem(i + 1, 2)

        @pl.when(i == 0)
        def _first():
            view_dma(0, slot).start()

        @pl.when(i + 1 < n)
        def _prefetch():
            view_dma(i + 1, next_slot).start()

        view_dma(i, slot).wait()

        # residual shift of THIS view's aligned window
        dy = tls_ref[i, 1] - (tls_ref[i, 1] // _TILE_H) * _TILE_H
        dx = tls_ref[i, 0] - (tls_ref[i, 0] // _TILE_W) * _TILE_W

        # Mosaic has no direct u8->f32 cast; widen through i32 (free on the VPU)
        x = win_ref[slot].astype(jnp.int32).astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        a_h = _shifted_interp(imgsz, cam, win_h, scale, dy)  # (imgsz, win_h)
        a_w = _shifted_interp(imgsz, cam, win_w, scale, dx)  # (imgsz, win_w)
        y = jnp.dot(a_h, x, preferred_element_type=jnp.float32)  # (imgsz, win_w)
        z = jnp.dot(y, a_w.T, preferred_element_type=jnp.float32)  # (imgsz, imgsz)
        # single-channel store: a trailing 3-lane axis is a pathological VMEM
        # layout — the gray→RGB broadcast happens outside (free in XLA)
        out_ref[0, :, :] = z.astype(out_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("cam", "imgsz", "out_dtype", "orig_hw"))
def crop_letterbox_views(
    frames: jnp.ndarray,
    frame_idx: jnp.ndarray,
    top_lefts: jnp.ndarray,
    cam: int,
    imgsz: int,
    out_dtype=jnp.bfloat16,
    orig_hw: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Fused preprocessing of N camera views.

    Args:
        frames: (C, H, W) uint8 resident frame chunk.
        frame_idx: (N,) int32 frame index of each view (into the chunk).
        top_lefts: (N, 2) int32 crop top-left (x, y), pre-clamped so crops fit
            inside ``orig_hw`` (or inside the chunk when ``orig_hw`` is None).
        cam: crop size (square camera view).
        imgsz: detector input size (square).
        orig_hw: the (H, W) the crops are clamped against.  Pass it when the
            chunk was pre-padded with :func:`padded_chunk_hw` — the wrapper
            then skips its per-call pad (hot-path case, see engine_video).

    Returns:
        (N, imgsz, imgsz, 3) ``out_dtype`` normalized views.
    """
    n = frame_idx.shape[0]
    c, h, w = frames.shape
    win_h, win_w = _win_hw(cam)

    # the aligned window must fit for the worst legal crop: grow the chunk if
    # the caller didn't pre-pad (pad once per chunk upstream to keep this off
    # the hot path)
    oh, ow = orig_hw if orig_hw is not None else (h, w)
    need_h, need_w = padded_chunk_hw(cam, oh, ow)
    if h < need_h or w < need_w:
        frames = jnp.pad(frames, ((0, 0), (0, max(0, need_h - h)), (0, max(0, need_w - w))))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # frames stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, imgsz, imgsz), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, win_h, win_w), jnp.uint8),  # double-buffered windows
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    # the package enables jax_enable_x64 globally; under x64 scalar promotion
    # sneaks int64 into the kernel trace, which Mosaic cannot cast back
    # (i64→i32 loops in its convert helper) — trace the kernel x64-free
    with jax.enable_x64(False):
        z = pl.pallas_call(
            _make_kernel(cam, imgsz, win_h, win_w),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n, imgsz, imgsz), out_dtype),
        )(frame_idx.astype(jnp.int32), top_lefts.astype(jnp.int32), frames)
    return jnp.broadcast_to(z[..., None], (*z.shape, 3))


def crop_letterbox_reference(frames, frame_idx, top_lefts, cam, imgsz, out_dtype=jnp.bfloat16):
    """Unfused reference implementation (crop → resize → broadcast)."""
    from wtracker_tpu.ops.image import crop_views, resize_bilinear

    views = crop_views(jnp.take(frames, frame_idx, axis=0), top_lefts, (cam, cam))
    x = views.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    z = resize_bilinear(x, (imgsz, imgsz))
    return jnp.broadcast_to(z[..., None], (*z.shape, 3)).astype(out_dtype)

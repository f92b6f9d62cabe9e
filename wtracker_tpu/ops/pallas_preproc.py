"""Pallas TPU kernel: fused camera-crop → bilinear-resize → normalize.

The video live loop's preprocessing chain (crop_views → letterbox →
normalize, engine_video.py) materializes two HBM intermediates per view —
the (cam, cam) uint8 crop and the (imgsz, imgsz, 3) f32 tensor.  This kernel
fuses the chain: per grid step it DMAs exactly the crop window out of the
resident frame chunk (HBM → VMEM), runs the constant-matrix bilinear resize on
the MXU, normalizes, and writes the detector-ready bf16 view.

Square views resize with no padding (the letterbox of a square source is a
pure resize), which is the platform's actual configuration — camera views are
square (config.py:53-57: 4×4 mm).

Layout notes (see the Pallas guide): scalar per-view parameters (frame index,
crop top-left) arrive via ``PrefetchScalarGridSpec`` so the kernel can issue
its DMA before the body runs; the interpolation matrices live in VMEM as
ordinary blocked inputs; accumulation is f32 on the MXU with a bf16 store.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wtracker_tpu.ops.image import _interp_matrix


def _kernel(idx_ref, tls_ref, frames_ref, a_h_ref, a_w_ref, out_ref, crop_ref, sem):
    i = pl.program_id(0)
    fidx = idx_ref[i]
    tlx = tls_ref[i, 0]
    tly = tls_ref[i, 1]

    cam = crop_ref.shape[0]
    dma = pltpu.make_async_copy(
        frames_ref.at[fidx, pl.ds(tly, cam), pl.ds(tlx, cam)],
        crop_ref,
        sem,
    )
    dma.start()
    dma.wait()

    x = crop_ref[...].astype(jnp.float32) * jnp.float32(1.0 / 255.0)  # (cam, cam)
    y = jnp.dot(a_h_ref[...], x, preferred_element_type=jnp.float32)  # (out, cam)
    z = jnp.dot(y, a_w_ref[...].T, preferred_element_type=jnp.float32)  # (out, out)
    out_ref[0, :, :, :] = jnp.broadcast_to(z[..., None], (*z.shape, 3)).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("cam", "imgsz", "out_dtype"))
def crop_letterbox_views(
    frames: jnp.ndarray,
    frame_idx: jnp.ndarray,
    top_lefts: jnp.ndarray,
    cam: int,
    imgsz: int,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Fused preprocessing of N camera views.

    Args:
        frames: (C, H, W) uint8 resident frame chunk.
        frame_idx: (N,) int32 frame index of each view (into the chunk).
        top_lefts: (N, 2) int32 crop top-left (x, y), pre-clamped in-bounds.
        cam: crop size (square camera view).
        imgsz: detector input size (square).

    Returns:
        (N, imgsz, imgsz, 3) ``out_dtype`` normalized views.
    """
    n = frame_idx.shape[0]
    a = jnp.asarray(_interp_matrix(cam, imgsz))  # (imgsz, cam) f32

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # frames stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a_h
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a_w
        ],
        out_specs=pl.BlockSpec(
            (1, imgsz, imgsz, 3), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((cam, cam), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
    )

    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, imgsz, imgsz, 3), out_dtype),
    )(frame_idx.astype(jnp.int32), top_lefts.astype(jnp.int32), frames, a, a)


def crop_letterbox_reference(frames, frame_idx, top_lefts, cam, imgsz, out_dtype=jnp.bfloat16):
    """Unfused reference implementation (crop → resize → broadcast)."""
    from wtracker_tpu.ops.image import crop_views, resize_bilinear

    views = crop_views(jnp.take(frames, frame_idx, axis=0), top_lefts, (cam, cam))
    x = views.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    z = resize_bilinear(x, (imgsz, imgsz))
    return jnp.broadcast_to(z[..., None], (*z.shape, 3)).astype(out_dtype)

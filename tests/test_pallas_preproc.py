"""Fused Pallas preprocessing kernel vs the unfused reference.

Runs in Pallas interpret mode on the CPU mesh; the same kernel compiles to
Mosaic on real TPU (exercised by bench/verify runs there).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from wtracker_tpu.ops.pallas_preproc import crop_letterbox_reference, crop_letterbox_views


def test_fused_matches_reference(rng):
    C, H, W = 6, 128, 160
    cam, imgsz = 48, 64
    frames = jnp.asarray(rng.integers(0, 255, size=(C, H, W), dtype=np.uint8))
    n = 5
    frame_idx = jnp.asarray(rng.integers(0, C, size=n), jnp.int32)
    tls = jnp.asarray(
        np.stack([rng.integers(0, W - cam, n), rng.integers(0, H - cam, n)], axis=1), jnp.int32
    )

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(crop_letterbox_views(frames, frame_idx, tls, cam, imgsz, jnp.float32))
    want = np.asarray(crop_letterbox_reference(frames, frame_idx, tls, cam, imgsz, jnp.float32))

    assert got.shape == (n, imgsz, imgsz, 3)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_fused_bf16_output(rng):
    C, H, W = 3, 96, 96
    cam, imgsz = 32, 64
    frames = jnp.asarray(rng.integers(0, 255, size=(C, H, W), dtype=np.uint8))
    frame_idx = jnp.asarray([0, 2], jnp.int32)
    tls = jnp.asarray([[10, 20], [0, 0]], jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        got = crop_letterbox_views(frames, frame_idx, tls, cam, imgsz)
    assert got.dtype == jnp.bfloat16
    want = crop_letterbox_reference(frames, frame_idx, tls, cam, imgsz)
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), np.asarray(want, dtype=np.float32), atol=0.01
    )

"""Image-op tests: matmul resize vs jax.image, letterbox geometry, crops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wtracker_tpu.ops.image import crop_views, letterbox, replicate_pad, resize_bilinear


def test_resize_upscale_matches_jax_image(rng):
    # on upscaling, non-antialiased linear == jax.image bilinear
    x = rng.uniform(0, 1, size=(3, 45, 61)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (64, 64)))
    want = np.asarray(jax.image.resize(jnp.asarray(x), (3, 64, 64), method="bilinear"))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_resize_matches_opencv_inter_linear(rng):
    # the parity target is OpenCV INTER_LINEAR (no antialiasing) — what the
    # reference stack uses for letterboxing
    cv = pytest.importorskip("cv2")
    x = rng.uniform(0, 1, size=(45, 61)).astype(np.float32)
    for out_hw in [(64, 64), (30, 20), (45, 61)]:
        got = np.asarray(resize_bilinear(jnp.asarray(x[None]), out_hw))[0]
        want = cv.resize(x, (out_hw[1], out_hw[0]), interpolation=cv.INTER_LINEAR)
        np.testing.assert_allclose(got, want, atol=3e-6, err_msg=str(out_hw))

    # channel-last color
    xc = rng.uniform(0, 1, size=(45, 61, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(xc[None]), (30, 20)))[0]
    want = cv.resize(xc, (20, 30), interpolation=cv.INTER_LINEAR)
    np.testing.assert_allclose(got, want, atol=3e-6)


def test_resize_downscale_and_identity(rng):
    x = rng.uniform(0, 1, size=(1, 32, 32)).astype(np.float32)
    same = np.asarray(resize_bilinear(jnp.asarray(x), (32, 32)))
    np.testing.assert_allclose(same, x, atol=1e-6)


def test_letterbox_geometry(rng):
    frames = rng.integers(0, 255, size=(2, 300, 400), dtype=np.uint8)
    out, (scale, pad_top, pad_left) = letterbox(jnp.asarray(frames), (416, 416))
    assert out.shape == (2, 416, 416, 3)
    assert np.isclose(scale, 416 / 400)
    assert pad_left == 0
    new_h = round(300 * scale)
    assert pad_top == (416 - new_h) // 2
    out = np.asarray(out)
    # padding rows hold the pad value
    np.testing.assert_allclose(out[:, : pad_top - 1], 114 / 255.0, atol=1e-6)
    assert out.min() >= 0 and out.max() <= 1.0


def test_replicate_pad_matches_np(rng):
    f = rng.integers(0, 255, size=(10, 12), dtype=np.uint8)
    got = np.asarray(replicate_pad(jnp.asarray(f), (3, 2)))
    want = np.pad(f, ((2, 2), (3, 3)), mode="edge")
    np.testing.assert_array_equal(got, want)


def test_crop_views(rng):
    frames = rng.integers(0, 255, size=(3, 40, 50), dtype=np.uint8)
    tls = jnp.asarray([[5, 7], [0, 0], [30, 20]])
    out = np.asarray(crop_views(jnp.asarray(frames), tls, (8, 10)))
    np.testing.assert_array_equal(out[0], frames[0, 7:15, 5:15])
    np.testing.assert_array_equal(out[1], frames[1, 0:8, 0:10])
    np.testing.assert_array_equal(out[2], frames[2, 20:28, 30:40])


def test_letterbox_indexed_matches_shared_letterbox():
    """Per-geometry letterbox operators reduce to the shared-matrix letterbox
    on each view's native content (mixed-geometry detector batches)."""
    import jax.numpy as jnp

    from wtracker_tpu.ops.image import letterbox, letterbox_indexed, make_letterbox_matrices

    rng = np.random.default_rng(0)
    canvas = (108, 110)
    geoms = [(99, 108), (101, 110)]
    my, mx, cy, cx, g = make_letterbox_matrices(geoms, canvas, (64, 64))
    views = rng.uniform(0, 255, size=(6, *canvas)).astype(np.float32)
    gids = np.array([0, 1, 0, 1, 1, 0])

    out = np.asarray(letterbox_indexed(jnp.asarray(views), jnp.asarray(gids), my, mx, cy, cx))
    assert out.shape == (6, 64, 64, 3)
    for i in range(6):
        h, w = geoms[gids[i]]
        ref, (s, pt, pl) = letterbox(jnp.asarray(views[i : i + 1, :h, :w]), (64, 64))
        assert np.isclose(s, g[gids[i]][0]) and (pt, pl) == g[gids[i]][1:]
        # batched-einsum tiling may differ from the shared-matrix contraction
        # by one f32 ulp; the geometry (placement, padding, scale) is exact
        assert np.abs(out[i] - np.asarray(ref)[0]).max() <= 2e-6


def test_make_letterbox_matrices_rejects_oversize_source():
    from wtracker_tpu.ops.image import make_letterbox_matrices

    with pytest.raises(ValueError, match="exceeds the canvas"):
        make_letterbox_matrices([(120, 100)], (110, 110), (64, 64))

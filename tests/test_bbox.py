"""Box-op tests: hand-computed cases plus host(numpy) vs device(jnp) parity."""

import numpy as np
import pytest

from wtracker_tpu.utils import bbox as hb
from wtracker_tpu.utils.bbox import BoxFormat


def test_format_conversions_roundtrip(rng):
    boxes = rng.uniform(-50, 400, size=(64, 4))
    boxes[:, 2:] = np.abs(boxes[:, 2:]) + 1  # positive w,h

    for src in BoxFormat:
        for dst in BoxFormat:
            converted = hb.change_format(boxes.copy(), BoxFormat.XYWH, src)
            back = hb.change_format(hb.change_format(converted, src, dst), dst, src)
            np.testing.assert_allclose(back, converted, atol=1e-9)


def test_conversion_values():
    b = np.array([[10.0, 20.0, 4.0, 6.0]])  # xywh
    np.testing.assert_allclose(hb.to_xyxy(b, BoxFormat.XYWH), [[10, 20, 14, 26]])
    np.testing.assert_allclose(hb.to_yolo(b, BoxFormat.XYWH), [[12, 23, 4, 6]])
    np.testing.assert_allclose(hb.center(b), [[12, 23]])
    xyxy = np.array([[10.0, 20.0, 14.0, 26.0]])
    np.testing.assert_allclose(hb.to_xywh(xyxy, BoxFormat.XYXY), b)


def test_round_outward():
    b = np.array([[1.2, 2.7, 3.1, 4.2]])  # xywh -> xyxy (1.2,2.7,4.3,6.9)
    r = hb.round_boxes(b, BoxFormat.XYWH)
    np.testing.assert_array_equal(hb.to_xyxy(r, BoxFormat.XYWH), [[1, 2, 5, 7]])
    assert r.dtype == np.int32


def test_discretize_legality():
    boxes = np.array(
        [
            [10.0, 10.0, 5.0, 5.0],  # legal
            [np.nan, 10.0, 5.0, 5.0],  # non-finite -> illegal
            [-10.0, -10.0, 5.0, 5.0],  # fully clamped away -> illegal
            [98.0, 98.0, 10.0, 10.0],  # partially clamped -> legal
        ]
    )
    out, legal = hb.discretize(boxes, bounds=(100, 100), box_format=BoxFormat.XYWH)
    np.testing.assert_array_equal(legal, [True, False, False, True])
    np.testing.assert_array_equal(out[1], [0, 0, 0, 0])
    np.testing.assert_array_equal(out[2], [0, 0, 0, 0])
    np.testing.assert_array_equal(out[0], [10, 10, 5, 5])
    np.testing.assert_array_equal(out[3], [98, 98, 2, 2])
    assert out.dtype == np.int32


def test_jnp_twin_matches_numpy(rng):
    import jax.numpy as jnp

    from wtracker_tpu.ops import boxes as db

    boxes = rng.uniform(-50, 400, size=(32, 4))
    boxes[:, 2:] = np.abs(boxes[:, 2:]) + 1
    boxes[3, 0] = np.nan

    for fmt in BoxFormat:
        np.testing.assert_allclose(
            np.asarray(db.to_xyxy(jnp.asarray(boxes), fmt)), hb.to_xyxy(boxes.copy(), fmt), atol=1e-9
        )
    np.testing.assert_allclose(np.asarray(db.center(jnp.asarray(boxes))), hb.center(boxes.copy()), atol=1e-9)

    d_out, d_legal = db.discretize(jnp.asarray(boxes), (300, 300), BoxFormat.XYWH)
    h_out, h_legal = hb.discretize(boxes.copy(), (300, 300), BoxFormat.XYWH)
    np.testing.assert_array_equal(np.asarray(d_out), h_out)
    np.testing.assert_array_equal(np.asarray(d_legal), h_legal)


def test_box_iou():
    import jax.numpy as jnp

    from wtracker_tpu.ops.boxes import box_iou

    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[5.0, 5.0, 15.0, 15.0]])
    np.testing.assert_allclose(np.asarray(box_iou(a, b)), [25.0 / 175.0], atol=1e-9)
    np.testing.assert_allclose(np.asarray(box_iou(a, a)), [1.0])
